"""Golden tests: quadrature demod, analytic signal, PLL harmonic, deemphasis."""

import numpy as np
from scipy import signal as sig

import oracles
from radiocore_tpu.ops.demod import quadrature_demod
from radiocore_tpu.ops.analytic import analytic_signal, pll_harmonic
from radiocore_tpu.ops.deemphasis import deemphasis_init, deemphasis_apply
from radiocore_tpu.ops import design

RNG = np.random.default_rng(3)


def test_quadrature_demod_matches_unwrap_diff():
    msg = np.clip(RNG.standard_normal(5000) * 0.3, -0.95, 0.95)
    iq = oracles.make_fm_iq(msg).astype(np.complex64)
    want = oracles.fm_demod(iq.astype(np.complex128))
    got = np.asarray(quadrature_demod(iq))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_quadrature_demod_recovers_message():
    msg = 0.5 * np.sin(2 * np.pi * 15 * np.arange(4000) / 4000)
    iq = oracles.make_fm_iq(msg, deviation_gain=0.9).astype(np.complex64)
    got = np.asarray(quadrature_demod(iq))
    np.testing.assert_allclose(got[1:], 0.9 * msg[1:], atol=1e-3)


def test_analytic_matches_scipy_hilbert():
    for n in (1024, 1023):  # even and odd
        x = RNG.standard_normal(n).astype(np.float32)
        want = sig.hilbert(x.astype(np.float64))
        got = np.asarray(analytic_signal(x))
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_pll_harmonic_doubles_frequency():
    fs, f0, n = 100000, 19000, 100000
    t = np.arange(n) / fs
    pilot = 0.1 * np.sin(2 * np.pi * f0 * t).astype(np.float32)
    sub = np.asarray(pll_harmonic(analytic_signal(pilot), 2, "imag"))
    # Unit amplitude 38 kHz tone (phase doubled, magnitude normalized).
    want = np.imag(sig.hilbert(pilot.astype(np.float64)) ** 2
                   ) / np.abs(sig.hilbert(pilot.astype(np.float64)) ** 2)
    np.testing.assert_allclose(sub, want, atol=1e-3)
    assert oracles.tone_snr_db(sub[500:-500], fs, 38000) > 30


def test_deemphasis_taps_match_dimpulse():
    want = oracles.deemphasis_taps(48000, 75e-6)
    got = design.deemphasis_taps(48000, 75e-6)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_deemphasis_streaming_matches_scipy():
    taps, hist = deemphasis_init(8000, 75e-6)
    zi = sig.lfilter_zi(taps, 1.0)
    x = RNG.standard_normal(24000)
    outs_ours, outs_ref = [], []
    for i in range(3):
        chunk = x[i * 8000:(i + 1) * 8000]
        y, hist = deemphasis_apply(chunk.astype(np.float32), taps, hist)
        outs_ours.append(np.asarray(y))
        yr, zi = oracles.deemphasis_stream(chunk, taps, zi)
        outs_ref.append(yr)
    np.testing.assert_allclose(np.concatenate(outs_ours),
                               np.concatenate(outs_ref), atol=1e-5)
