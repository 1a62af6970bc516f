"""Pallas MXU FIR kernel vs the reference conv implementation.

Runs in interpreter mode on CPU; the same kernel compiles natively on
TPU (exercised by bench.py / TPU verification drives).
"""

import numpy as np
import pytest
from scipy import signal as sig

from radiocore_tpu.kernels.fir_pallas import (fir_causal_pallas,
                                              taps_to_band_matrices)
from radiocore_tpu.ops.fir import fir_causal

RNG = np.random.default_rng(21)


def test_band_matrices_reconstruct_taps():
    taps = RNG.standard_normal(51)
    m = taps_to_band_matrices(taps)
    assert m.shape == (2, 128, 128)
    # Row i of M_0 holds taps shifted: M_0[i, i+k] == taps[k].
    assert np.allclose(m[0][0, :51], taps, atol=1e-6)
    assert np.allclose(m[0][10, 10:61], taps, atol=1e-6)
    # Halo matrix covers the wrap: M_1[i, c] == taps[c + 128 - i].
    assert np.allclose(m[1][100, 0:23], taps[28:51], atol=1e-6)


@pytest.mark.parametrize("n,t", [(1000, 31), (40_000, 51), (70_000, 129),
                                 (5000, 200)])
def test_matches_fir_causal(n, t):
    x = RNG.standard_normal(n).astype(np.float32)
    taps = sig.firwin(t, 0.3)
    want = np.asarray(fir_causal(x, taps))
    got = np.asarray(fir_causal_pallas(x, taps, block_rows=8))
    np.testing.assert_allclose(got, want, atol=2e-4 * np.max(np.abs(want)))


def test_matches_with_history():
    x = RNG.standard_normal(2000).astype(np.float32)
    taps = sig.firwin(41, 0.25)
    hist = RNG.standard_normal(40).astype(np.float32)
    want = np.asarray(fir_causal(x, taps, history=hist))
    got = np.asarray(fir_causal_pallas(x, taps, history=hist, block_rows=8))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_wide_taps_short_signal():
    """Taps wider than the (shrunken) signal block: block_rows must be
    clamped up to halo_pad or the prev_tails halo slice under-sizes
    (n=2048 is 16 rows; ~2050 taps need a 24-row halo slab)."""
    n, t = 2048, 2050
    x = RNG.standard_normal(n).astype(np.float32)
    taps = sig.firwin(t, 0.1)
    want = np.asarray(fir_causal(x, taps, impl="conv"))
    got = np.asarray(fir_causal_pallas(x, taps))
    np.testing.assert_allclose(got, want, atol=2e-4 * np.max(np.abs(want)))


def test_batched():
    x = RNG.standard_normal((3, 4000)).astype(np.float32)
    taps = sig.firwin(61, [0.2, 0.4], pass_zero=False)
    want = np.asarray(fir_causal(x, taps))
    got = np.asarray(fir_causal_pallas(x, taps, block_rows=8))
    np.testing.assert_allclose(got, want, atol=1e-4)
