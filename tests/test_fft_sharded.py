"""Distributed band FFT on the 8-device virtual mesh vs numpy."""

import numpy as np

from radiocore_tpu.parallel.mesh import make_radio_mesh
from radiocore_tpu.parallel.fft_sharded import (fft_sharded_auto,
                                                fft_sharded_blocks,
                                                fft_sharded_fourstep,
                                                split_for_shards)

RNG = np.random.default_rng(9)


def test_auto_sharded_fft_matches_numpy():
    mesh = make_radio_mesh(stations=1, time=8)
    x = (RNG.standard_normal(65536) +
         1j * RNG.standard_normal(65536)).astype(np.complex64)
    want = np.fft.fft(x.astype(np.complex128))
    got = np.asarray(fft_sharded_auto(x, mesh))
    np.testing.assert_allclose(got, want, atol=2e-3 * np.max(np.abs(want)))


def test_fourstep_sharded_fft_matches_numpy():
    mesh = make_radio_mesh(stations=1, time=8)
    n, n1 = 65536, 256
    x = (RNG.standard_normal(n) +
         1j * RNG.standard_normal(n)).astype(np.complex64)
    want = np.fft.fft(x.astype(np.complex128))
    got_mat = np.asarray(fft_sharded_fourstep(x, mesh, n1=n1))
    # Matrix layout (k1, k2) → standard order k = k1 + n1·k2.
    got = got_mat.T.reshape(-1)
    np.testing.assert_allclose(got, want, atol=2e-3 * np.max(np.abs(want)))


def test_blocks_sharded_fft_matches_numpy():
    """Six-step form: standard-order output in contiguous blocks."""
    mesh = make_radio_mesh(stations=1, time=8)
    for n in (65536, 200_000):
        x = (RNG.standard_normal(n) +
             1j * RNG.standard_normal(n)).astype(np.complex64)
        want = np.fft.fft(x.astype(np.complex128))
        got = np.asarray(fft_sharded_blocks(x, mesh))
        np.testing.assert_allclose(got, want,
                                   atol=2e-3 * np.max(np.abs(want)))


def test_split_for_shards():
    assert split_for_shards(1 << 24, 8) == (8 * 512, 8 * 512)
    n1, n2 = split_for_shards(200_000, 8)
    assert n1 * n2 == 200_000 and n1 % 8 == 0 and n2 % 8 == 0
    assert split_for_shards(100, 8) is None  # 100 % 64 != 0


def test_fourstep_odd_smooth_size():
    """A 2^a·5^b size typical of radio rates, sharded 8 ways."""
    mesh = make_radio_mesh(stations=1, time=8)
    n, n1 = 320_000, 400  # n2 = 800; both factors divisible by 8
    x = (RNG.standard_normal(n) +
         1j * RNG.standard_normal(n)).astype(np.complex64)
    want = np.fft.fft(x.astype(np.complex128))
    got = np.asarray(fft_sharded_fourstep(x, mesh, n1=n1)).T.reshape(-1)
    np.testing.assert_allclose(got, want, atol=2e-3 * np.max(np.abs(want)))
