"""Analytic-signal pilot tracker ("PLL").

Parity with reference ``radiocore/analog/pll.py:6-58``: not a feedback
loop — ``step`` stores the Hilbert analytic signal of the pilot; ``real``/
``image`` return unit-amplitude harmonics by raising it to an integer
power (phase multiplication).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from radiocore_tpu.runtime.transfer import to_device_c64, to_device_f32

from radiocore_tpu.ops.analytic import analytic_signal, pll_harmonic


class PLL:
    def __init__(self, cuda: bool = False):
        del cuda
        self._baseline = None
        self._analytic = jax.jit(analytic_signal)

    def step(self, input_sig) -> None:
        x = (to_device_c64(input_sig)
             if (hasattr(input_sig, 'dtype')
                 and jnp.issubdtype(jnp.dtype(input_sig.dtype),
                                    jnp.complexfloating))
             else to_device_f32(input_sig))
        self._baseline = self._analytic(x)

    def real(self, mult: float = 1.0) -> jnp.ndarray:
        """Real part of the locked carrier at ``harmonic`` (cosine)."""
        return pll_harmonic(self._baseline, int(mult), "real")

    def image(self, mult: float = 1.0) -> jnp.ndarray:
        """Imag part of the locked carrier at ``harmonic`` (sine)."""
        return pll_harmonic(self._baseline, int(mult), "imag")
