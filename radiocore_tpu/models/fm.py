"""Generic FM quadrature demodulator.

Reference pipeline ``angle → unwrap → diff → pad → /π → decimate →
expand_dims`` (reference: ``radiocore/analog/fm.py:46-72``), rebuilt as a
pure windowed-resample quadrature demod. The reference's unused
``deemphasis`` ctor argument is kept for signature parity and documented
as unused (reference: ``radiocore/analog/fm.py:20-21``).
"""

from __future__ import annotations

from typing import Callable, Union

import numpy as np
import jax
import jax.numpy as jnp

from radiocore_tpu.runtime.transfer import to_device_c64, to_host

from radiocore_tpu.ops import design
from radiocore_tpu.ops.resample import resample_fft
from radiocore_tpu.ops.demod import quadrature_demod


def make_fm_step(input_size: int, output_size: int) -> Callable:
    """Pure FM step: ``iq (..., input_size) c64 → audio (..., output_size) f32``.

    Stateless. The spectral hamming window is applied even when
    input_size == output_size, matching the reference's internal
    ``Decimate`` (reference: ``radiocore/analog/fm.py:36-37,66``).
    """
    input_size, output_size = int(input_size), int(output_size)
    win = design.resample_window("hamm", input_size)

    def step(iq: jnp.ndarray) -> jnp.ndarray:
        demod = quadrature_demod(iq)
        return resample_fft(demod, output_size, win).astype(jnp.float32)

    return step


class FM:
    """Stateful wrapper with the reference ``run`` API; output ``(N, 1)``."""

    def __init__(self, input_size: Union[int, float],
                 output_size: Union[int, float],
                 deemphasis: float = 75e-6, cuda: bool = False):
        del deemphasis, cuda  # parity-only args (deemphasis unused in fm mode)
        self._input_size = int(input_size)
        self._output_size = int(output_size)
        self._step = jax.jit(make_fm_step(self._input_size, self._output_size))

    @property
    def channels(self) -> int:
        """Audio channel count (1: mono)."""
        return 1

    def run(self, input_sig, numpy_output: bool = True):
        """Demodulate one chunk (reference FM.run parity: returns numpy
                ``(output_size, 1)`` unless ``numpy_output=False``)."""
        if len(input_sig) != self._input_size:
            raise ValueError("input_sig size and input_size mismatch")
        iq = to_device_c64(input_sig)
        audio = self._step(iq)[:, None]
        return to_host(audio) if numpy_output else audio
