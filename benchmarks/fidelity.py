"""Audio-fidelity acceptance harness — BASELINE.md configs 1–3.

Acceptance: audio within 1 dB SNR of the CPU (NumPy/SciPy) reference
path. This harness synthesizes stereo-multiplex FM stations, runs both
the float64 oracle chain (tests/oracles.py — the reference math) and
this framework, and reports the match SNR in dB per config. A match SNR
of X dB means the framework's audio differs from the reference by a
noise floor X dB below the signal — ≫ the 1 dB bound for any X > ~6.

Run on CPU for the oracle comparison:
    JAX_PLATFORMS=cpu python benchmarks/fidelity.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def config1_mfm(oracles):
    """Single MFM mono station: 2.4 MS/s IQ → 240 kS/s → 48 kHz audio."""
    from radiocore_tpu import Decimate, MFM

    fs_in, fs_demod, fs_audio = 2_400_000, 240_000, 48_000
    mpx = oracles.make_stereo_multiplex(fs_demod, fs_demod, 440.0, 1000.0)
    iq = oracles.make_fm_iq(mpx, 0.25)
    # Upsample the station to the SDR rate (periodic, exact in spectrum).
    spec = np.fft.fft(iq)
    up = np.zeros(fs_in, np.complex128)
    up[:fs_demod // 2] = spec[:fs_demod // 2]
    up[-fs_demod // 2:] = spec[-fs_demod // 2:]
    band = np.fft.ifft(up) * (fs_in / fs_demod)

    want_station = oracles.decimate(band, fs_demod)
    want, _ = oracles.mfm(want_station, fs_demod, fs_audio)

    station = Decimate(fs_in, fs_demod).run(band.astype(np.complex64))
    got = MFM(fs_demod, fs_audio).run(station)[:, 0]
    return oracles.snr_db(want, got)


def config2_wbfm(oracles):
    """WBFM stereo with pilot PLL + de-emphasis at 2.4 MS/s."""
    from radiocore_tpu import Decimate, WBFM

    fs_in, fs_demod, fs_audio = 2_400_000, 240_000, 48_000
    mpx = oracles.make_stereo_multiplex(fs_demod, fs_demod, 440.0, 1000.0)
    iq = oracles.make_fm_iq(mpx, 0.25)
    spec = np.fft.fft(iq)
    up = np.zeros(fs_in, np.complex128)
    up[:fs_demod // 2] = spec[:fs_demod // 2]
    up[-fs_demod // 2:] = spec[-fs_demod // 2:]
    band = np.fft.ifft(up) * (fs_in / fs_demod)

    want_station = oracles.decimate(band, fs_demod)
    want, _ = oracles.wbfm(want_station, fs_demod, fs_audio)

    station = Decimate(fs_in, fs_demod).run(band.astype(np.complex64))
    got = WBFM(fs_demod, fs_audio).run(station)
    return min(oracles.snr_db(want[:, 0], got[:, 0]),
               oracles.snr_db(want[:, 1], got[:, 1]))


def config3_tuner(oracles):
    """Tuner channelizes a 10 MS/s band into 8 stations, batched WBFM."""
    from scipy import signal as sig
    from radiocore_tpu import Tuner, WBFM

    fs_band, bw, fs_audio = 10_000_000, 240_000, 48_000
    n_st = 8
    center = 100_000_000
    offsets = [(i - (n_st - 1) / 2) * 1_000_000 for i in range(n_st)]

    tuner = Tuner()
    demods = []
    for off in offsets:
        demod = WBFM(bw, fs_audio)
        tuner.add_channel(center + off, bw, demod)
        demods.append(demod)
    tuner.request_bandwidth(fs_band)
    n = int(tuner.input_bandwidth)

    band = np.zeros(n, np.complex128)
    stations_iq = []
    for i, off in enumerate(offsets):
        mpx = oracles.make_stereo_multiplex(bw, bw, 300.0 + 40 * i,
                                            900.0 + 60 * i)
        iq = oracles.make_fm_iq(mpx, 0.25)
        stations_iq.append(iq)
        spec = np.fft.fft(iq)
        up = np.zeros(n, np.complex128)
        up[:bw // 2] = spec[:bw // 2]
        up[-bw // 2:] = spec[-bw // 2:]
        band += (np.fft.ifft(up) * (n / bw)
                 * np.exp(2j * np.pi * int(off) * np.arange(n) / n))

    tuner.load(band.astype(np.complex64))
    stations = np.asarray(tuner.run_all())

    # Oracle: per-channel roll + freq-domain resample, then WBFM chain.
    win = np.fft.fftshift(sig.get_window("hann", n))
    X = np.fft.fft(band.astype(np.complex64).astype(np.complex128))
    worst = np.inf
    for i, ch in enumerate(tuner.channels()):
        shift = int(tuner.input_frequency - ch.center_frequency)
        st_ref = sig.resample(np.roll(X, shift) * win, bw, domain="freq")
        want, _ = oracles.wbfm(st_ref, bw, fs_audio)
        got = ch.demodulator.run(stations[i])
        snr = min(oracles.snr_db(want[:, 0], got[:, 0]),
                  oracles.snr_db(want[:, 1], got[:, 1]))
        worst = min(worst, snr)
    return worst


def main() -> None:
    import oracles
    results = {
        "config1_mfm_2p4MSps_match_snr_db": round(config1_mfm(oracles), 1),
        "config2_wbfm_stereo_match_snr_db": round(config2_wbfm(oracles), 1),
        "config3_tuner_8ch_worst_match_snr_db": round(config3_tuner(oracles), 1),
        "acceptance": "within 1 dB SNR of reference (BASELINE.md)",
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
