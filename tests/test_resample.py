"""Golden tests: resample_fft vs scipy.signal.resample (SURVEY.md §4)."""

import numpy as np
import pytest
from scipy import signal as sig

from radiocore_tpu.ops.resample import resample_fft, resample_spectrum
from radiocore_tpu.ops import design

RNG = np.random.default_rng(42)


def _check(x, num, window=None, tol=2e-4):
    want = sig.resample(x, num, window=window)
    got = np.asarray(resample_fft(x.astype(
        np.complex64 if np.iscomplexobj(x) else np.float32), num,
        window=window))
    scale = max(np.max(np.abs(want)), 1e-9)
    np.testing.assert_allclose(got, want, atol=tol * scale, rtol=0)


@pytest.mark.parametrize("n,num", [
    (1000, 200),   # even → even downsample
    (1000, 250),
    (1000, 1000),  # identity size
    (500, 1500),   # upsample even
    (999, 333),    # odd n
    (1000, 321),   # odd num (unpaired-bin fix skipped)
    (320, 1001),   # odd upsample
])
def test_real_no_window(n, num):
    _check(RNG.standard_normal(n), num)


@pytest.mark.parametrize("n,num", [(1000, 200), (1000, 250), (999, 333),
                                   (500, 1500), (1000, 321)])
def test_complex_no_window(n, num):
    x = RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
    _check(x, num)


@pytest.mark.parametrize("n,num", [(1000, 200), (999, 333), (500, 1500)])
def test_real_with_window(n, num):
    win = np.fft.fftshift(sig.get_window("hamm", n))
    _check(RNG.standard_normal(n), num, window=win)


@pytest.mark.parametrize("n,num", [(1000, 200), (999, 333), (500, 1500)])
def test_complex_with_window(n, num):
    win = np.fft.fftshift(sig.get_window("hamm", n))
    x = RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
    _check(x, num, window=win)


def test_batched_matches_loop():
    x = (RNG.standard_normal((4, 600)) +
         1j * RNG.standard_normal((4, 600))).astype(np.complex64)
    win = design.resample_window("hamm", 600)
    got = np.asarray(resample_fft(x, 120, window=win))
    for i in range(4):
        want = np.asarray(resample_fft(x[i], 120, window=win))
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_spectrum_domain_matches_scipy_freq():
    x = RNG.standard_normal(800) + 1j * RNG.standard_normal(800)
    X = np.fft.fft(x)
    win = np.fft.fftshift(sig.get_window("hann", 800))
    want = sig.resample(X * win, 160, domain="freq")
    got = np.asarray(resample_spectrum(
        (X * win).astype(np.complex64), 160))
    np.testing.assert_allclose(got, want, atol=2e-4 * np.max(np.abs(want)))
