"""Zero-phase FIR bandpass filter class.

Parity with reference ``radiocore/analog/bandpass.py:7-74``: taps by
``firwin(num_taps, [lo, hi], pass_zero=False, window='hamm')`` with Hz
normalized under the one-second convention; ``run`` applies the filter
forward-backward (zero phase) like ``filtfilt``.
"""

from __future__ import annotations

from typing import Union

import numpy as np
import jax
import jax.numpy as jnp

from radiocore_tpu.ops import design
from radiocore_tpu.ops.fir import zero_phase_fir
from radiocore_tpu.runtime.transfer import to_device_c64, to_device_f32


class Bandpass:
    def __init__(self, input_size: Union[int, float],
                 start_freq: Union[int, float],
                 stop_freq: Union[int, float],
                 dtype: str = "float32", num_taps: int = 61,
                 window: str = "hamm", cuda: bool = False):
        del cuda
        self._input_size = int(input_size)
        self._dtype = dtype
        self._taps = design.bandpass_taps(num_taps, float(start_freq),
                                          float(stop_freq), self._input_size,
                                          win=window)
        self._run = jax.jit(lambda x: zero_phase_fir(x, self._taps))

    @property
    def taps(self) -> np.ndarray:
        """The designed FIR taps (host NumPy, for inspection/tests)."""
        return self._taps

    def run(self, input_sig):
        """Zero-phase bandpass one chunk (scipy filtfilt edge semantics)."""
        if len(input_sig) != self._input_size:
            raise ValueError("input_sig size and input_size mismatch")
        if jnp.issubdtype(jnp.dtype(self._dtype), jnp.complexfloating):
            x = to_device_c64(input_sig).astype(self._dtype)
        else:
            x = to_device_f32(input_sig).astype(self._dtype)
        return self._run(x)
