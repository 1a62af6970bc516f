"""Parity of the fully-fused extraction kernel (slice+window+Nyquist
fix+IFFT in one Pallas pass, kernels/extract_pallas.py) against the
shipped XLA extractor — which is itself golden-matched to the scipy
``resample(roll(X, s)·W, m)`` oracle (test_tuner.py). CPU runs the
kernel in interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _uniform_plan(c, m, n):
    """Offsets producing the uniform tiling the fused pipeline uses."""
    half = n // 2 - m // 2
    return [int(-half + i * m) for i in range(c)]


def _spectrum(n, seed=3):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n)
            + 1j * rng.standard_normal(n)).astype(np.complex64) * 0.3


@pytest.mark.parametrize("c,m,n", [
    (4, 512, 2048),      # n == c·m, a0 m-aligned (zero-copy index map)
    (3, 512, 2048),      # c < n/m (plan narrower than the band view)
    (4, 1024, 8192),     # aligned, wider view
])
def test_fused_matches_extractor(c, m, n, monkeypatch):
    from radiocore_tpu.ops import channelize

    shifts = tuple(int(-o) for o in _uniform_plan(c, m, n))
    spec = jnp.asarray(_spectrum(n))

    channelize.make_extractor.cache_clear()
    want = np.asarray(channelize.make_extractor(n, shifts, m)(spec))

    monkeypatch.setenv("RADIOCORE_TPU_EXTRACT_IFFT", "fused")
    channelize.make_extractor.cache_clear()
    got = np.asarray(channelize.make_extractor(n, shifts, m)(spec))
    channelize.make_extractor.cache_clear()

    assert got.shape == want.shape == (c, m)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_fused_unaligned_start(monkeypatch):
    """a0 not a multiple of m → the XLA pre-roll path."""
    from radiocore_tpu.ops import channelize

    c, m, n = 4, 512, 4096
    # Shift every station by a non-multiple of m: starts move together,
    # so the plan stays uniform but a0 % m != 0.
    offs = [o + 100 for o in _uniform_plan(c, m, n)]
    shifts = tuple(int(-o) for o in offs)
    spec = jnp.asarray(_spectrum(n, seed=7))

    channelize.make_extractor.cache_clear()
    want = np.asarray(channelize.make_extractor(n, shifts, m)(spec))

    monkeypatch.setenv("RADIOCORE_TPU_EXTRACT_IFFT", "fused")
    channelize.make_extractor.cache_clear()
    got = np.asarray(channelize.make_extractor(n, shifts, m)(spec))
    channelize.make_extractor.cache_clear()

    np.testing.assert_allclose(got, want, atol=2e-6)


def test_fused_full_wrap_last_station(monkeypatch):
    """Last station's Nyquist neighbour wraps to spectrum[a0]."""
    from radiocore_tpu.kernels.extract_pallas import extract_rows_pallas
    from radiocore_tpu.ops import channelize

    c, m, n = 4, 256, 1024          # n == c·m: full coverage, wraps
    shifts = tuple(int(-o) for o in _uniform_plan(c, m, n))
    spec = jnp.asarray(_spectrum(n, seed=11))

    channelize.make_extractor.cache_clear()
    want = np.asarray(channelize.make_extractor(n, shifts, m)(spec))

    starts, _w, _f, _m2, _run = channelize.extraction_plan(n, shifts, m)
    got = np.asarray(extract_rows_pallas(spec, starts[0], c, m,
                                         1.0 / ((n / m) * m)))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_fused_batched_input_falls_back(monkeypatch):
    """Leading dims can't use the fused kernel — must still be correct."""
    from radiocore_tpu.ops import channelize

    c, m, n = 4, 512, 2048
    shifts = tuple(int(-o) for o in _uniform_plan(c, m, n))
    spec = jnp.stack([jnp.asarray(_spectrum(n, seed=s)) for s in (1, 2)])

    channelize.make_extractor.cache_clear()
    want = np.asarray(channelize.make_extractor(n, shifts, m)(spec))

    monkeypatch.setenv("RADIOCORE_TPU_EXTRACT_IFFT", "fused")
    channelize.make_extractor.cache_clear()
    got = np.asarray(channelize.make_extractor(n, shifts, m)(spec))
    channelize.make_extractor.cache_clear()

    np.testing.assert_allclose(got, want, atol=2e-6)


def test_auto_routes_fused_on_tpu_native_on_cpu(monkeypatch):
    """The unset-env 'auto' default selects the fused kernel iff the
    platform probe says TPU (the shipped r4 default flip) — and the
    fused result still matches the native path (ADVICE r4: the auto
    routing itself had no regression test)."""
    from radiocore_tpu.kernels import extract_pallas
    from radiocore_tpu.ops import channelize
    from radiocore_tpu.runtime import platform

    c, m, n = 4, 512, 2048
    shifts = tuple(int(-o) for o in _uniform_plan(c, m, n))
    spec = jnp.asarray(_spectrum(n, seed=5))

    monkeypatch.delenv("RADIOCORE_TPU_EXTRACT_IFFT", raising=False)
    calls = []
    real_kernel = extract_pallas.extract_rows_pallas

    def recording_kernel(*a, **k):
        calls.append(1)
        return real_kernel(*a, **k)

    monkeypatch.setattr(extract_pallas, "extract_rows_pallas",
                        recording_kernel)

    # auto + has_tpu()=False → native lowering, kernel never invoked.
    monkeypatch.setattr(platform, "has_tpu", lambda: False)
    channelize.make_extractor.cache_clear()
    want = np.asarray(channelize.make_extractor(n, shifts, m)(spec))
    assert not calls

    # auto + has_tpu()=True → the fused kernel (interpret mode on CPU).
    monkeypatch.setattr(platform, "has_tpu", lambda: True)
    channelize.make_extractor.cache_clear()
    got = np.asarray(channelize.make_extractor(n, shifts, m)(spec))
    channelize.make_extractor.cache_clear()
    assert calls, "auto on TPU must route through the fused kernel"

    np.testing.assert_allclose(got, want, atol=2e-6)
