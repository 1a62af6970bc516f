"""Pallas whole-row FFT kernel vs the float64 numpy oracle.

CPU interpret mode (tests/conftest.py forces cpu); the hardware soak is
benchmarks/pallas_soak.py --fft.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from radiocore_tpu.kernels.fft_pallas import (
    fft_pow2_pallas, ifft_pow2_pallas, fft_pow2_pallas_planar,
    fft_large_pow2_pallas, plan_sizes)


def _rand_c64(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) +
            1j * rng.standard_normal(shape)).astype(np.complex64)


def _rel(got, want):
    got = np.asarray(got, dtype=np.complex128)
    return np.max(np.abs(got - want)) / np.max(np.abs(want))


@pytest.mark.parametrize("length", [256, 1024, 2048, 4096, 16384, 1 << 18])
def test_forward_matches_numpy(length):
    x = _rand_c64((length,), seed=length)
    want = np.fft.fft(x.astype(np.complex128))
    got = fft_pow2_pallas(jnp.asarray(x))
    assert _rel(got, want) < 2e-6


@pytest.mark.parametrize("batch", [1, 3, 8])
def test_batched_rows(batch):
    x = _rand_c64((batch, 4096), seed=batch)
    want = np.fft.fft(x.astype(np.complex128), axis=-1)
    got = fft_pow2_pallas(jnp.asarray(x))
    assert _rel(got, want) < 2e-6


def test_multi_lead_dims():
    x = _rand_c64((2, 3, 2048), seed=5)
    want = np.fft.fft(x.astype(np.complex128), axis=-1)
    got = fft_pow2_pallas(jnp.asarray(x))
    assert _rel(got, want) < 2e-6


def test_inverse_roundtrip():
    x = _rand_c64((4, 4096), seed=7)
    y = ifft_pow2_pallas(fft_pow2_pallas(jnp.asarray(x)))
    assert _rel(y, x.astype(np.complex128)) < 2e-6


def test_planar_entry_point():
    x = _rand_c64((2, 2048), seed=9)
    want = np.fft.fft(x.astype(np.complex128), axis=-1)
    yr, yi = fft_pow2_pallas_planar(jnp.asarray(x.real), jnp.asarray(x.imag))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert _rel(got, want) < 2e-6


@pytest.mark.parametrize("n", [1 << 20])
def test_large_band_fft(n):
    x = _rand_c64((n,), seed=11)
    want = np.fft.fft(x.astype(np.complex128))
    got = fft_large_pow2_pallas(jnp.asarray(x))
    assert _rel(got, want) < 5e-6


def test_large_inverse_sign():
    n = 1 << 20
    x = _rand_c64((n,), seed=13)
    want = np.fft.ifft(x.astype(np.complex128)) * n
    got = fft_large_pow2_pallas(jnp.asarray(x), sign=+1.0)
    assert _rel(got, want) < 5e-6


def test_rfft_matches_numpy():
    from radiocore_tpu.kernels.fft_pallas import rfft_pow2_pallas
    rng = np.random.default_rng(21)
    x = rng.standard_normal((3, 8192)).astype(np.float32)
    want = np.fft.rfft(x.astype(np.float64), axis=-1)
    got = rfft_pow2_pallas(jnp.asarray(x))
    assert _rel(got, want) < 2e-6


def test_irfft_roundtrip():
    from radiocore_tpu.kernels.fft_pallas import (rfft_pow2_pallas,
                                                  irfft_pow2_pallas)
    rng = np.random.default_rng(22)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    y = irfft_pow2_pallas(rfft_pow2_pallas(jnp.asarray(x)), 4096)
    assert np.max(np.abs(np.asarray(y) - x)) < 2e-5


def test_irfft_matches_numpy():
    from radiocore_tpu.kernels.fft_pallas import irfft_pow2_pallas
    rng = np.random.default_rng(23)
    n = 2048
    spec = (rng.standard_normal(n // 2 + 1)
            + 1j * rng.standard_normal(n // 2 + 1)).astype(np.complex64)
    spec[0] = spec[0].real
    spec[-1] = spec[-1].real
    want = np.fft.irfft(spec.astype(np.complex128), n=n)
    got = irfft_pow2_pallas(jnp.asarray(spec), n)
    assert np.max(np.abs(np.asarray(got) - want)) < 2e-6


def test_rejects_bad_sizes():
    with pytest.raises(ValueError):
        fft_pow2_pallas(jnp.zeros(3000, jnp.complex64))
    with pytest.raises(ValueError):
        fft_pow2_pallas(jnp.zeros(1 << 20, jnp.complex64))


def test_plan_sizes_leaf_bounds():
    for length in (256, 2048, 1 << 14, 1 << 18, 1 << 19):
        for s in plan_sizes(length):
            assert 2 <= s <= 128


def test_grouped_pad_path():
    """Prime-ish batch counts pad to a group multiple (r3 weak #7: a
    batch of 61 short rows used to degrade to group=1); results must be
    identical to the unpadded math."""
    x = _rand_c64((61, 2048), seed=61)
    want = np.fft.fft(x.astype(np.complex128), axis=-1)
    got = fft_pow2_pallas(jnp.asarray(x))
    assert got.shape == (61, 2048)
    assert _rel(got, want) < 2e-6


def test_irfft_discards_edge_imag():
    """Nonzero imag in the DC/Nyquist bins must be ignored, matching
    np.fft.irfft / the planner (ADVICE r3 low)."""
    from radiocore_tpu.kernels.fft_pallas import irfft_pow2_pallas
    rng = np.random.default_rng(31)
    n = 2048
    spec = (rng.standard_normal(n // 2 + 1)
            + 1j * rng.standard_normal(n // 2 + 1)).astype(np.complex64)
    # Leave DC/Nyquist imag NONZERO on purpose.
    want = np.fft.irfft(spec.astype(np.complex128), n=n)
    got = irfft_pow2_pallas(jnp.asarray(spec), n)
    assert np.max(np.abs(np.asarray(got) - want)) < 2e-6


def test_mixed_split_and_large_mixed():
    """Mixed-radix split (a·pow2, a ≤ 128) + interpret-mode parity for
    small non-pow2 analogs of the 96-station 24M band (= 48·2^19)."""
    import numpy as np
    import jax.numpy as jnp
    from radiocore_tpu.kernels.fft_pallas import (fft_large_mixed_pallas,
                                                  mixed_split)

    assert mixed_split(3 << 23) == (96, 1 << 18)   # rows capped at 2^18
    assert mixed_split(3 << 22) == (48, 1 << 18)
    assert mixed_split(1009) is None          # prime: no a·pow2 split

    rng = np.random.default_rng(2)
    for n in (3 << 12, 5 << 11):
        x = (rng.standard_normal(n)
             + 1j * rng.standard_normal(n)).astype(np.complex64)
        got = np.asarray(fft_large_mixed_pallas(jnp.asarray(x)))
        ref = np.fft.fft(x)
        rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        assert rel < 1e-4, (n, rel)
