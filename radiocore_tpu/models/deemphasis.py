"""Streaming FM de-emphasis filter class.

Parity with reference ``radiocore/analog/deemphasis.py:7-66``: 51-tap FIR
approximation of the single-pole IIR, state carried across calls, state
seeded at the unit-step steady state.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from radiocore_tpu.ops.deemphasis import deemphasis_init, deemphasis_apply
from radiocore_tpu.runtime.transfer import to_device_f32


class Deemphasis:
    def __init__(self, input_size: Union[int, float], rate: float = 75e-6,
                 dtype: str = "float32", cuda: bool = False):
        del cuda
        self._input_size = int(input_size)
        self._dtype = dtype
        self._taps, self._state = deemphasis_init(self._input_size, rate,
                                                  dtype=dtype)
        self._run = jax.jit(
            lambda x, h: deemphasis_apply(x, self._taps, h))

    def run(self, input_sig):
        """Apply streaming de-emphasis to one chunk (state carried)."""
        if len(input_sig) != self._input_size:
            raise ValueError("input_sig size and input_size mismatch")
        x = to_device_f32(input_sig).astype(self._dtype)
        y, self._state = self._run(x, self._state)
        return y
