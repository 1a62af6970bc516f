"""Parity of the fused extraction+demod kernel vs the two-step path
(extraction — itself golden vs the scipy oracle — followed by
ops.demod.quadrature_demod). CPU runs the kernel in interpret mode."""

import numpy as np
import pytest

import jax.numpy as jnp


def _uniform_plan(c, m, n):
    half = n // 2 - m // 2
    return [int(-half + i * m) for i in range(c)]


def _spectrum(n, seed=3):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n)
            + 1j * rng.standard_normal(n)).astype(np.complex64) * 0.3


@pytest.mark.parametrize("c,m,n", [
    (4, 512, 2048),      # aligned zero-copy index map
    (3, 512, 2048),      # plan narrower than the band view
    (4, 1024, 8192),     # wider view
])
def test_fused_demod_matches_two_step(c, m, n):
    from radiocore_tpu.ops import channelize
    from radiocore_tpu.ops.demod import quadrature_demod
    from radiocore_tpu.kernels.extract_demod_pallas import (
        extract_demod_rows_pallas)

    shifts = tuple(int(-o) for o in _uniform_plan(c, m, n))
    spec = jnp.asarray(_spectrum(n))

    channelize.make_extractor.cache_clear()
    iq = channelize.make_extractor(n, shifts, m)(spec)
    want = np.asarray(quadrature_demod(iq))

    starts, _w, _f, _m2, _run = channelize.extraction_plan(n, shifts, m)
    got = np.asarray(extract_demod_rows_pallas(spec, starts[0], c, m))

    assert got.shape == want.shape == (c, m)
    # atan2 of near-equal products: agreement is bounded by the phase
    # noise of the f32 transforms on near-zero-magnitude samples.
    np.testing.assert_allclose(got, want, atol=5e-5)
    # The chunk-edge convention: first sample exactly zero.
    assert np.all(got[:, 0] == 0.0)


def test_fused_demod_unaligned_start():
    from radiocore_tpu.ops import channelize
    from radiocore_tpu.ops.demod import quadrature_demod
    from radiocore_tpu.kernels.extract_demod_pallas import (
        extract_demod_rows_pallas)

    c, m, n = 4, 512, 4096
    offs = [o + 100 for o in _uniform_plan(c, m, n)]
    shifts = tuple(int(-o) for o in offs)
    spec = jnp.asarray(_spectrum(n, seed=7))

    channelize.make_extractor.cache_clear()
    iq = channelize.make_extractor(n, shifts, m)(spec)
    want = np.asarray(quadrature_demod(iq))

    starts, _w, _f, _m2, _run = channelize.extraction_plan(n, shifts, m)
    got = np.asarray(extract_demod_rows_pallas(spec, starts[0], c, m))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_fused_demod_on_fm_signal():
    """End-to-end sanity on a real FM multiplex: the demodulated quad of
    an extracted station must recover the baseband (not just match the
    other impl on noise)."""
    from radiocore_tpu.ops import channelize
    from radiocore_tpu.ops.demod import quadrature_demod
    from radiocore_tpu.kernels.extract_demod_pallas import (
        extract_demod_rows_pallas)

    c, m, n = 4, 1024, 4096
    # Station 1 carries an FM tone at its center.
    t = np.arange(n) / n
    base = np.sin(2 * np.pi * 40.0 * t)
    phase = np.cumsum(base) * (2 * np.pi * 100.0 / n)
    offsets = _uniform_plan(c, m, n)
    carrier = np.exp(1j * (2 * np.pi * offsets[1] * t + phase))
    band = (carrier + 0.001 * np.random.default_rng(5).standard_normal(n)
            ).astype(np.complex64)
    spec = jnp.asarray(np.fft.fft(band).astype(np.complex64))

    shifts = tuple(int(-o) for o in offsets)
    channelize.make_extractor.cache_clear()
    iq = channelize.make_extractor(n, shifts, m)(spec)
    want = np.asarray(quadrature_demod(iq))
    starts, *_ = channelize.extraction_plan(n, shifts, m)
    got = np.asarray(extract_demod_rows_pallas(spec, starts[0], c, m))

    np.testing.assert_allclose(got[1], want[1], atol=5e-5)
    # The demodulated station-1 signal correlates with the baseband tone.
    sl = slice(m // 8, -m // 8)
    g = got[1][sl] - got[1][sl].mean()
    b = np.interp(np.arange(m) * (n / m), np.arange(n), base)[sl]
    b = b - b.mean()
    rho = np.dot(g, b) / np.sqrt(np.dot(g, g) * np.dot(b, b) + 1e-30)
    assert rho > 0.9


def test_atan2_poly_matches_numpy():
    """Octant-reduced polynomial atan2 (Mosaic has no atan lowering) vs
    float64 np.arctan2 over all quadrants + axes + origin."""
    from radiocore_tpu.kernels.extract_demod_pallas import atan2_poly
    rng = np.random.default_rng(41)
    y = rng.standard_normal(4096).astype(np.float32) * 3
    x = rng.standard_normal(4096).astype(np.float32) * 3
    # Edge cases: axes and origin.
    y = np.concatenate([y, [0, 0, 1, -1, 0]]).astype(np.float32)
    x = np.concatenate([x, [1, -1, 0, 0, 0]]).astype(np.float32)
    got = np.asarray(atan2_poly(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y.astype(np.float64), x.astype(np.float64))
    # np.arctan2(0, -1) = +pi; ours too. Origin: ours 0, numpy 0.
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_fused_demod_spec_matches_two_step():
    """Spectrum-output mega-kernel (extract+demod+forward transform in
    one pass) vs extraction → quadrature_demod → fft."""
    from radiocore_tpu.ops import channelize
    from radiocore_tpu.ops.demod import quadrature_demod
    from radiocore_tpu.kernels.extract_demod_pallas import (
        extract_demod_spec_ok, extract_demod_spec_rows_pallas)

    c, m, n = 4, 16_384, 65_536          # smallest A==C row (2^14)
    assert extract_demod_spec_ok(n, m, c)
    shifts = tuple(int(-o) for o in _uniform_plan(c, m, n))
    spec = jnp.asarray(_spectrum(n, seed=13))

    channelize.make_extractor.cache_clear()
    iq = channelize.make_extractor(n, shifts, m)(spec)
    quad = quadrature_demod(iq)
    want = np.fft.fft(np.asarray(quad).astype(np.complex128), axis=-1)

    starts, *_ = channelize.extraction_plan(n, shifts, m)
    got = np.asarray(extract_demod_spec_rows_pallas(spec, starts[0], c, m))

    assert got.shape == (c, m)
    # Forward-DFT output error ~ sqrt(m)*eps on O(1) inputs.
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got / scale, want / scale, atol=3e-5)


def test_fused_demod_spec_keep_bins():
    """keep_bins writes only the low rows; values must match the full
    kernel's prefix."""
    from radiocore_tpu.ops import channelize
    from radiocore_tpu.kernels.extract_demod_pallas import (
        extract_demod_spec_rows_pallas)

    c, m, n = 4, 16_384, 65_536
    shifts = tuple(int(-o) for o in _uniform_plan(c, m, n))
    spec = jnp.asarray(_spectrum(n, seed=17))
    starts, *_ = channelize.extraction_plan(n, shifts, m)

    full = np.asarray(extract_demod_spec_rows_pallas(spec, starts[0], c, m))
    kb = m // 4 + 100
    part = np.asarray(extract_demod_spec_rows_pallas(spec, starts[0], c, m,
                                                     keep_bins=kb))
    assert part.shape[1] >= kb and part.shape[1] < m
    np.testing.assert_allclose(part, full[:, :part.shape[1]], atol=0)
