"""Pallas TPU kernels for the hot DSP paths.

The reference leans on cuSignal's CUDA kernels for its hot loops
(SURVEY.md §2.4); these are the TPU-native equivalents, written with
:mod:`jax.experimental.pallas`.
"""

from radiocore_tpu.kernels.fir_pallas import fir_causal_pallas, taps_to_band_matrices

__all__ = ["fir_causal_pallas", "taps_to_band_matrices"]
