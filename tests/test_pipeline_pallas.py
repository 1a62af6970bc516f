"""Parity of the Pallas-lowered fused pipeline vs the default lowering.

Exercises the exact composition the hardware A/B runs
(benchmarks/run_tpu_queue3.sh bench_all_pallas): extraction IFFT via
the whole-row VMEM kernel (RADIOCORE_TPU_EXTRACT_IFFT=pallas), on a
small pow2 plan. CPU runs the kernel in interpret mode.
"""

import importlib

import numpy as np
import pytest


@pytest.fixture(params=["pallas", "fused"])
def pallas_extract_env(request, monkeypatch):
    monkeypatch.setenv("RADIOCORE_TPU_EXTRACT_IFFT", request.param)
    # make_extractor reads the env at build time and is lru_cached —
    # clear so the knob takes effect and leaks to no other test.
    from radiocore_tpu.ops import channelize
    channelize.make_extractor.cache_clear()
    yield
    channelize.make_extractor.cache_clear()


def test_fused_step_matches_default(pallas_extract_env):
    from radiocore_tpu.ops import channelize
    from radiocore_tpu.parallel.pipeline import make_multi_station_step

    # station_chunk is the per-station sample rate (one-second
    # convention) and must clear the 38 kHz stereo subcarrier.
    n_stations, station_chunk, audio_chunk = 4, 65_536, 16_384
    n_band = n_stations * station_chunk
    half = n_band // 2 - station_chunk // 2
    offsets = [int(-half + i * station_chunk) for i in range(n_stations)]

    rng = np.random.default_rng(17)
    band = (rng.standard_normal(n_band)
            + 1j * rng.standard_normal(n_band)).astype(np.complex64) * 0.1

    step_p, state_p = make_multi_station_step(
        n_band, offsets, station_chunk, audio_chunk, mode="fast")
    got, _ = step_p(band, state_p)

    # Rebuild with the default lowering.
    import os
    os.environ.pop("RADIOCORE_TPU_EXTRACT_IFFT", None)
    channelize.make_extractor.cache_clear()
    step_d, state_d = make_multi_station_step(
        n_band, offsets, station_chunk, audio_chunk, mode="fast")
    want, _ = step_d(band, state_d)

    # Extraction parity is 2e-6 (test_extract_pallas); the quadrature
    # demod's phase differencing amplifies that to ~2e-5 on the audio.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=4e-5)


import pytest


@pytest.mark.parametrize("impl", ["fused", "spec"])
def test_fused_extract_demod_step_matches_default(impl, monkeypatch):
    """RADIOCORE_TPU_EXTRACT_DEMOD=fused|spec: band spectrum → quad
    (or composite spectrum) in one Pallas pass + the fast_spec tail
    must match the default fast step."""
    import numpy as np
    from radiocore_tpu.ops import channelize
    from radiocore_tpu.parallel.pipeline import make_multi_station_step

    n_stations, station_chunk, audio_chunk = 4, 65_536, 16_384
    n_band = n_stations * station_chunk
    half = n_band // 2 - station_chunk // 2
    offsets = [int(-half + i * station_chunk) for i in range(n_stations)]

    rng = np.random.default_rng(23)
    band = (rng.standard_normal(n_band)
            + 1j * rng.standard_normal(n_band)).astype(np.complex64) * 0.1

    monkeypatch.setenv("RADIOCORE_TPU_EXTRACT_DEMOD", impl)
    step_p, state_p = make_multi_station_step(
        n_band, offsets, station_chunk, audio_chunk, mode="fast")
    got, _ = step_p(band, state_p)

    monkeypatch.delenv("RADIOCORE_TPU_EXTRACT_DEMOD")
    channelize.make_extractor.cache_clear()
    step_d, state_d = make_multi_station_step(
        n_band, offsets, station_chunk, audio_chunk, mode="fast")
    want, _ = step_d(band, state_d)

    assert np.asarray(got).shape == np.asarray(want).shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4)


def test_station_rfft_pallas_routing_matches(monkeypatch):
    """RADIOCORE_TPU_STATION_RFFT=pallas (the hoisted fast-mode station
    rfft through the VMEM kernel) must match the native lowering."""
    from radiocore_tpu.ops import channelize
    from radiocore_tpu.parallel.pipeline import make_multi_station_step

    n_stations, station_chunk, audio_chunk = 2, 65_536, 16_384
    n_band = n_stations * station_chunk
    half = n_band // 2 - station_chunk // 2
    offsets = [int(-half + i * station_chunk) for i in range(n_stations)]

    rng = np.random.default_rng(23)
    band = (rng.standard_normal(n_band)
            + 1j * rng.standard_normal(n_band)).astype(np.complex64) * 0.1

    monkeypatch.delenv("RADIOCORE_TPU_STATION_RFFT", raising=False)
    channelize.make_extractor.cache_clear()
    step_n, st_n = make_multi_station_step(
        n_band, offsets, station_chunk, audio_chunk, mode="fast")
    want, _ = step_n(band, st_n)

    monkeypatch.setenv("RADIOCORE_TPU_STATION_RFFT", "pallas")
    channelize.make_extractor.cache_clear()
    step_p, st_p = make_multi_station_step(
        n_band, offsets, station_chunk, audio_chunk, mode="fast")
    got, _ = step_p(band, st_p)
    channelize.make_extractor.cache_clear()

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=4e-5)
