"""Pallas TPU kernels for the hot DSP paths.

The reference leans on cuSignal's CUDA kernels for its hot loops
(SURVEY.md §2.4); these are the TPU-native equivalents, written with
:mod:`jax.experimental.pallas`.
"""

from radiocore_tpu.kernels.fir_pallas import fir_causal_pallas, taps_to_band_matrices
from radiocore_tpu.kernels.fft_pallas import (
    fft_pow2_pallas, ifft_pow2_pallas, fft_pow2_pallas_planar,
    rfft_pow2_pallas, irfft_pow2_pallas, fft_large_pow2_pallas)

__all__ = [
    "fir_causal_pallas", "taps_to_band_matrices",
    "fft_pow2_pallas", "ifft_pow2_pallas", "fft_pow2_pallas_planar",
    "rfft_pow2_pallas", "irfft_pow2_pallas", "fft_large_pow2_pallas",
]
