"""Tuner channelizer tests: band-plan math, tone extraction, batched path."""

import numpy as np
import pytest
from scipy import signal as sig

from radiocore_tpu import Tuner, Channel


def test_band_plan_recalculation():
    """Center/width from channel extremes, padded to mean-bw multiple
    (reference: tuner.py:163-174)."""
    tuner = Tuner()
    tuner.add_channel(96.9e6, 240e3, None)
    tuner.add_channel(94.5e6, 240e3, None)
    tuner.add_channel(97.5e6, 240e3, None)
    lo = 94.5e6 - 120e3
    hi = 97.5e6 + 120e3
    assert tuner.input_frequency == (lo + hi) / 2
    span = hi - lo
    padded = span + (-span) % 240e3
    assert tuner.input_bandwidth == padded
    assert padded % 240e3 == 0


def test_request_bandwidth_upward_only():
    tuner = Tuner()
    tuner.add_channel(100.0e6, 200e3, None)
    with pytest.raises(ValueError):
        tuner.request_bandwidth(100e3)
    tuner.request_bandwidth(2e6)
    assert tuner.input_bandwidth == 2e6


def test_channel_address_bytes():
    ch = Channel(0, 240e3, None, 0, 96.9e6, 0)
    assert ch.address_bytes == int(96.9e6).to_bytes(4, "little")


def _tone_band(n, offsets_hz, tone_offsets_hz):
    """Full band: per channel, a complex tone near each channel center."""
    t = np.arange(n) / n  # 1 second
    band = np.zeros(n, np.complex128)
    for off, toff in zip(offsets_hz, tone_offsets_hz):
        band += np.exp(2j * np.pi * (off + toff) * t)
    return band


def test_run_extracts_tone_at_offset():
    """A tone 5 kHz above a channel's center appears at +5 kHz baseband."""
    n = 1_000_000  # 1 MS/s band, 1 second
    bw = 100_000
    tuner = Tuner()
    center = 500_000_000
    tuner.add_channel(center - 200_000, bw, None)
    tuner.add_channel(center + 200_000, bw, None)
    # Pad: span = 500 kHz → padded to 500 kHz; request the full 1 MHz.
    tuner.request_bandwidth(n)

    band = _tone_band(n, [-200_000, 200_000], [5_000, -12_000])
    tuner.load(band)

    ch0 = np.asarray(tuner.run(0))
    assert ch0.shape == (bw,)
    peak = np.argmax(np.abs(np.fft.fft(ch0)))
    assert peak == 5_000
    ch1 = np.asarray(tuner.run(1))
    peak1 = np.argmax(np.abs(np.fft.fft(ch1)))
    assert peak1 == bw - 12_000  # negative offset → top bins


def test_run_matches_scipy_reference_path():
    """Per-channel run == roll + windowed freq-domain scipy resample."""
    n = 200_000
    bw = 20_000
    tuner = Tuner()
    c0 = 50_000_000
    tuner.add_channel(c0 - 40_000, bw, None)
    tuner.add_channel(c0 + 40_000, bw, None)
    tuner.request_bandwidth(n)

    rng = np.random.default_rng(0)
    band = (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    tuner.load(band)

    win = np.fft.fftshift(sig.get_window("hann", n))
    X = np.fft.fft(band.astype(np.complex64).astype(np.complex128))
    for i, ch in enumerate(tuner.channels()):
        shift = int(tuner.input_frequency - ch.center_frequency)
        want = sig.resample(np.roll(X, shift) * win, bw, domain="freq")
        got = np.asarray(tuner.run(i))
        np.testing.assert_allclose(got, want,
                                   atol=3e-4 * np.max(np.abs(want)))


def test_run_all_matches_run():
    n = 200_000
    bw = 20_000
    tuner = Tuner()
    c0 = 50_000_000
    for off in (-60_000, -20_000, 20_000, 60_000):
        tuner.add_channel(c0 + off, bw, None)
    tuner.request_bandwidth(n)

    rng = np.random.default_rng(1)
    tuner.load(rng.standard_normal(n) + 1j * rng.standard_normal(n))

    batched = np.asarray(tuner.run_all())
    assert batched.shape == (4, bw)
    for i in range(4):
        np.testing.assert_allclose(batched[i], np.asarray(tuner.run(i)),
                                   atol=1e-5)


def test_run_all_rejects_heterogeneous():
    tuner = Tuner()
    tuner.add_channel(1e6, 100e3, None)
    tuner.add_channel(2e6, 200e3, None)
    tuner.load(np.zeros(int(tuner.input_bandwidth), np.complex64))
    with pytest.raises(ValueError):
        tuner.run_all()
