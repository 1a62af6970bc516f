"""Golden tests: FIR ops vs scipy lfilter/filtfilt (SURVEY.md §4)."""

import numpy as np
from scipy import signal as sig

from radiocore_tpu.ops.fir import (fir_causal, fir_stream, zero_phase_fir,
                                   fir_overlap_save)
from radiocore_tpu.ops import design

RNG = np.random.default_rng(7)


def test_fir_causal_matches_lfilter():
    x = RNG.standard_normal(500).astype(np.float32)
    taps = sig.firwin(31, 0.3)
    want = sig.lfilter(taps, 1.0, x.astype(np.float64))
    got = np.asarray(fir_causal(x, taps))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fir_causal_complex():
    x = (RNG.standard_normal(300) + 1j * RNG.standard_normal(300)
         ).astype(np.complex64)
    taps = sig.firwin(21, 0.4)
    want = sig.lfilter(taps, 1.0, x.astype(np.complex128))
    got = np.asarray(fir_causal(x, taps))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fir_stream_chunked_equals_whole():
    """Chunked streaming with carried history == one-shot filtering."""
    x = RNG.standard_normal(1200).astype(np.float32)
    taps = sig.firwin(41, 0.2)
    whole = np.asarray(fir_causal(x, taps))

    hist = np.zeros(40, np.float32)
    parts = []
    for i in range(4):
        y, hist = fir_stream(x[i * 300:(i + 1) * 300], taps, hist)
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts), whole, atol=1e-5)


def test_fir_stream_matches_scipy_zi():
    """Carried raw-input history ≡ scipy lfilter zi state threading."""
    x = RNG.standard_normal(800)
    taps = sig.firwin(25, 0.35)
    zi = sig.lfilter_zi(taps, 1.0)  # unit-step steady state
    want1, zi = sig.lfilter(taps, 1.0, x[:400], zi=zi)
    want2, _ = sig.lfilter(taps, 1.0, x[400:], zi=zi)

    hist = np.ones(24, np.float32)  # same steady state as raw history
    got1, hist = fir_stream(x[:400].astype(np.float32), taps, hist)
    got2, _ = fir_stream(x[400:].astype(np.float32), taps, hist)
    np.testing.assert_allclose(np.asarray(got1), want1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got2), want2, atol=1e-5)


def test_overlap_save_matches_direct():
    taps = sig.firwin(63, 0.3)
    for n in (10_000, 65_536, 12_345):
        x = RNG.standard_normal(n).astype(np.float32)
        want = np.asarray(fir_causal(x, taps))
        got = np.asarray(fir_overlap_save(x, taps, block=4096))
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_overlap_save_complex_with_history():
    taps = sig.firwin(41, 0.2)
    x = (RNG.standard_normal(20_000) + 1j * RNG.standard_normal(20_000)
         ).astype(np.complex64)
    hist = (RNG.standard_normal(40) + 1j * RNG.standard_normal(40)
            ).astype(np.complex64)
    want = np.asarray(fir_causal(x, taps, history=hist))
    got = np.asarray(fir_overlap_save(x, taps, history=hist, block=2048))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_zero_phase_matches_filtfilt():
    x = RNG.standard_normal(2000).astype(np.float32)
    taps = design.bandpass_taps(41, 19e3 - 50, 19e3 + 50, 100000)
    want = sig.filtfilt(taps, [1.0], x.astype(np.float64))
    got = np.asarray(zero_phase_fir(x, taps))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_zero_phase_batched():
    x = RNG.standard_normal((3, 1000)).astype(np.float32)
    taps = sig.firwin(61, [0.2, 0.5], pass_zero=False)
    got = np.asarray(zero_phase_fir(x, taps))
    for i in range(3):
        want = sig.filtfilt(taps, [1.0], x[i].astype(np.float64))
        np.testing.assert_allclose(got[i], want, atol=2e-5)
