"""Mono broadcast-FM demodulator.

Reference pipeline: FM demod+decimate → streaming de-emphasis → remove
DC → clip ±0.999 (reference: ``radiocore/analog/mfm.py:50-66``).
"""

from __future__ import annotations

from typing import Callable, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from radiocore_tpu.runtime.transfer import to_device_c64, to_host

from radiocore_tpu.models.fm import make_fm_step
from radiocore_tpu.ops.deemphasis import deemphasis_init, deemphasis_apply

CLIP = 0.999


def mfm_init_state(output_size: int, rate: float = 75e-6,
                   batch_shape: Tuple[int, ...] = ()):
    """Initial de-emphasis history (per station when batched)."""
    _, hist = deemphasis_init(output_size, rate, batch_shape=batch_shape)
    return {"deemph": hist}


def make_mfm_step(input_size: int, output_size: int,
                  deemphasis: float = 75e-6) -> Callable:
    """Pure MFM step: ``(iq (..., input_size), state) → (audio (..., output_size), state)``."""
    fm = make_fm_step(input_size, output_size)
    de_taps, _ = deemphasis_init(int(output_size), deemphasis)

    def step(iq: jnp.ndarray, state):
        audio = fm(iq)
        audio, hist = deemphasis_apply(audio, de_taps, state["deemph"])
        audio = audio - jnp.mean(audio, axis=-1, keepdims=True)
        audio = jnp.clip(audio, -CLIP, CLIP)
        return audio.astype(jnp.float32), {"deemph": hist}

    return step


class MFM:
    """Stateful wrapper with the reference ``run`` API; output ``(N, 1)``."""

    def __init__(self, input_size: Union[int, float],
                 output_size: Union[int, float],
                 deemphasis: float = 75e-6, cuda: bool = False):
        del cuda
        self._input_size = int(input_size)
        self._output_size = int(output_size)
        self._step = jax.jit(
            make_mfm_step(self._input_size, self._output_size, deemphasis))
        self._state = mfm_init_state(self._output_size, deemphasis)

    @property
    def channels(self) -> int:
        """Audio channel count (1: mono)."""
        return 1

    def run(self, input_sig, numpy_output: bool = True):
        """Demodulate one chunk, carrying de-emphasis state across calls
                (reference MFM.run parity)."""
        if len(input_sig) != self._input_size:
            raise ValueError("input_sig size and input_size mismatch")
        iq = to_device_c64(input_sig)
        audio, self._state = self._step(iq, self._state)
        audio = audio[:, None]
        return to_host(audio) if numpy_output else audio
