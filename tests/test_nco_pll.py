"""Feedback NCO PLL: acquisition, tracking, streaming, analytic parity."""

import numpy as np

from radiocore_tpu.ops.nco_pll import (pll_design, pll_init, nco_pll_track,
                                       pll_subcarrier)
from radiocore_tpu.ops.analytic import analytic_signal, pll_harmonic

FS = 100_000


def _pilot(n, f=19e3, phi0=0.5, fs=FS):
    t = np.arange(n) / fs
    return np.sin(2 * np.pi * f * t + phi0).astype(np.float32), \
        2 * np.pi * f * t + phi0


def test_locks_and_regenerates_subcarrier():
    pilot, theta = _pilot(FS, f=19_003.0)   # 3 Hz off nominal
    gains = pll_design(FS, 19e3, loop_bw_hz=100.0)
    traj, state = nco_pll_track(pilot, gains, pll_init())
    sub = np.asarray(pll_subcarrier(traj, 2, "imag"))
    want = -np.sin(2 * theta)
    settle = 20_000
    err = np.sqrt(np.mean((sub[settle:] - want[settle:]) ** 2))
    assert err < 0.05, err
    # Frequency integrator captured the 3 Hz offset.
    assert abs(float(state.freq) * FS / (2 * np.pi) - 3.0) < 1.0


def test_streaming_matches_one_shot():
    pilot, _ = _pilot(2 * FS)
    gains = pll_design(FS, 19e3)
    whole, _ = nco_pll_track(pilot, gains, pll_init())

    state = pll_init()
    parts = []
    for i in range(2):
        traj, state = nco_pll_track(pilot[i * FS:(i + 1) * FS], gains, state)
        parts.append(np.asarray(traj))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(whole),
                               atol=1e-4)


def test_parity_with_analytic_path():
    """Once locked, the feedback PLL's subcarrier matches the reference's
    analytic-signal subcarrier (the demodulator contract)."""
    pilot, _ = _pilot(FS)
    gains = pll_design(FS, 19e3, loop_bw_hz=100.0)
    traj, _ = nco_pll_track(pilot, gains, pll_init())
    sub_fb = np.asarray(pll_subcarrier(traj, 2, "imag"))
    sub_an = np.asarray(pll_harmonic(analytic_signal(pilot), 2, "imag"))
    settle = 20_000
    err = np.sqrt(np.mean((sub_fb[settle:-100] - sub_an[settle:-100]) ** 2))
    assert err < 0.05, err


def test_batched():
    p0, _ = _pilot(FS // 2)
    p1, _ = _pilot(FS // 2, phi0=1.2)
    pilots = np.stack([p0, p1])
    gains = pll_design(FS, 19e3)
    traj, state = nco_pll_track(pilots, gains, pll_init(batch_shape=(2,)))
    assert traj.shape == (2, FS // 2)
    solo, _ = nco_pll_track(p1, gains, pll_init())
    np.testing.assert_allclose(np.asarray(traj[1]), np.asarray(solo),
                               atol=1e-5)
