"""FFT-method resampler class.

Parity with reference ``radiocore/analog/decimate.py:7-50`` (despite its
docstring, the reference performs FFT resampling, not FIR decimation):
``resample(x, output_size, window=fftshift(hamming(input_size)))``,
supporting arbitrary (non-integer) ratios and complex or real inputs.
"""

from __future__ import annotations

from typing import Union

import numpy as np
import jax
import jax.numpy as jnp

from radiocore_tpu.ops import design
from radiocore_tpu.ops.resample import resample_fft
from radiocore_tpu.runtime.transfer import to_device_c64, to_device_f32


class Decimate:
    def __init__(self, input_size: Union[int, float],
                 output_size: Union[int, float], cuda: bool = False):
        del cuda
        self._input_size = int(input_size)
        self._output_size = int(output_size)
        self._win = design.resample_window("hamm", self._input_size)
        self._run = jax.jit(
            lambda x: resample_fft(x, self._output_size, self._win))

    def run(self, input_sig):
        """FFT-resample one chunk to the output rate (scipy semantics)."""
        if len(input_sig) != self._input_size:
            raise ValueError("input_sig size and input_size mismatch")
        if (np.iscomplexobj(input_sig)
                or (isinstance(input_sig, jax.Array)
                    and jnp.iscomplexobj(input_sig))):
            x = to_device_c64(input_sig)
        else:
            x = to_device_f32(input_sig)
        return self._run(x)
