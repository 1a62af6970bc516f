"""Polyphase filterbank channelizer: tone routing, streaming, rejection."""

import numpy as np
import pytest

from radiocore_tpu.ops.pfb import pfb_taps, pfb_init, pfb_channelize

FS = 64_000
M = 16          # 16 channels of 4 kHz
P = 8


def _tone(f, n=FS, fs=FS, amp=1.0):
    return (amp * np.exp(2j * np.pi * f * np.arange(n) / fs)
            ).astype(np.complex64)


def test_tone_lands_in_its_channel():
    taps = pfb_taps(M, P)
    k0, delta = 3, 200.0                      # 3·4kHz + 200 Hz
    x = _tone(k0 * FS / M + delta)
    ch, _ = pfb_channelize(x, taps, M)
    assert ch.shape == (FS // M, M)
    power = np.mean(np.abs(ch) ** 2, axis=0)
    assert np.argmax(power) == k0
    # Near-unit passband gain close to the channel center; non-adjacent
    # channels strongly rejected (adjacent overlap is inherent to a
    # critically-sampled PFB).
    assert abs(power[k0] - 1.0) < 0.1
    far = np.delete(power, [k0 - 1, k0, k0 + 1])
    assert 10 * np.log10(power[k0] / far.max()) > 20

    # Exactly on-center: prototype stopband rejection in full.
    p_center = np.mean(np.abs(
        pfb_channelize(_tone(k0 * FS / M), taps, M)[0]) ** 2, axis=0)
    far_c = np.delete(np.asarray(p_center), [k0 - 1, k0, k0 + 1])
    assert 10 * np.log10(p_center[k0] / far_c.max()) > 40

    # Residual offset appears at baseband of the decimated channel.
    spec = np.abs(np.fft.fft(ch[P:, k0]))
    n_frames = len(ch) - P
    peak_bin = np.argmax(spec)
    expect = round(delta * n_frames / (FS / M))
    assert abs(peak_bin - expect) <= 1


def test_negative_channel_wraps():
    taps = pfb_taps(M, P)
    x = _tone(-FS / M)  # channel -1 == M-1
    ch, _ = pfb_channelize(x, taps, M)
    power = np.mean(np.abs(ch) ** 2, axis=0)
    assert np.argmax(power) == M - 1


def test_streaming_chunks_match_one_shot():
    taps = pfb_taps(M, P)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(3 * FS) + 1j * rng.standard_normal(3 * FS)
         ).astype(np.complex64)
    whole, _ = pfb_channelize(x, taps, M)

    hist = pfb_init(M, P)
    parts = []
    for i in range(3):
        ch, hist = pfb_channelize(x[i * FS:(i + 1) * FS], taps, M,
                                  history=hist)
        parts.append(np.asarray(ch))
    np.testing.assert_allclose(np.concatenate(parts, axis=0),
                               np.asarray(whole), atol=1e-5)


def test_batched():
    taps = pfb_taps(M, P)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((2, FS)) + 1j * rng.standard_normal((2, FS))
         ).astype(np.complex64)
    ch, hist = pfb_channelize(x, taps, M)
    assert ch.shape == (2, FS // M, M)
    assert hist.shape == (2, (P - 1) * M)
    one, _ = pfb_channelize(x[1], taps, M)
    np.testing.assert_allclose(np.asarray(ch[1]), np.asarray(one), atol=1e-6)


def test_real_input():
    taps = pfb_taps(M, P)
    x = np.cos(2 * np.pi * 2 * FS / M * np.arange(FS) / FS).astype(np.float32)
    ch, _ = pfb_channelize(x, taps, M)
    power = np.mean(np.abs(ch) ** 2, axis=0)
    # Real tone splits into ±k: channels 2 and M−2.
    assert set(np.argsort(power)[-2:]) == {2, M - 2}


def test_validates_sizes():
    taps = pfb_taps(M, P)
    with pytest.raises(ValueError):
        pfb_channelize(np.zeros(FS + 1, np.complex64), taps, M)
    with pytest.raises(ValueError):
        pfb_channelize(np.zeros(FS, np.complex64), taps[:-1], M)
