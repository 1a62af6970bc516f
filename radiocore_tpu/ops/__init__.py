"""DSP primitive ops: pure jnp functions + host-side filter design.

Layer L2 of the architecture (SURVEY.md §7.1). Every function here is a
pure, jit-compatible transformation with static shapes; all tap/window
*design* lives in :mod:`radiocore_tpu.ops.design` and runs host-side NumPy
at construction/trace time — mirroring the reference's split where
``scipy.signal`` designs taps on host even on the GPU path
(reference: ``radiocore/_internal/injector.py:22-27`` keeps ``_ss`` =
host scipy.signal for design).
"""

from radiocore_tpu.ops import design
from radiocore_tpu.ops import fft
from radiocore_tpu.ops.resample import resample_fft, resample_spectrum
from radiocore_tpu.ops.fir import fir_causal, zero_phase_fir, fir_stream
from radiocore_tpu.ops.demod import quadrature_demod
from radiocore_tpu.ops.analytic import analytic_signal, pll_harmonic
from radiocore_tpu.ops.deemphasis import deemphasis_init, deemphasis_apply
from radiocore_tpu.ops.pfb import pfb_taps, pfb_init, pfb_channelize

__all__ = [
    "design", "fft",
    "resample_fft", "resample_spectrum",
    "fir_causal", "zero_phase_fir", "fir_stream",
    "quadrature_demod",
    "analytic_signal", "pll_harmonic",
    "deemphasis_init", "deemphasis_apply",
    "pfb_taps", "pfb_init", "pfb_channelize",
]
