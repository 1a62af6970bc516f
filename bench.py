"""Benchmark: real-time WBFM stereo channels per chip (fused pipeline).

Runs the fused channelize+demod pipeline (full-band FFT → all-stations
spectrum gather → batched WBFM stereo demod) on the default accelerator
and reports how many 250 kS/s WBFM stereo stations one chip sustains in
real time (1 s of IQ processed per wall-clock second).

Baseline: the reference publishes no numbers (BASELINE.md); the
comparison point is the project north-star target of ≥100 real-time
channels on a v5e-16, i.e. 6.25 channels/chip — ``vs_baseline`` is the
measured value over that target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main() -> None:
    import os
    import jax

    # Persistent compiled-program cache: remote TPU compiles in this
    # environment can take minutes, and repeat bench runs are identical.
    try:
        cache_dir = os.path.expanduser("~/.cache/radiocore_tpu/jaxcache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import jax.numpy as jnp
    from radiocore_tpu.parallel.pipeline import make_multi_station_step

    n_stations = 64
    # TPU-native rate plan: hardware-friendly powers of two (native XLA
    # FFTs at every stage). 262 144 S/s stations carry ~5% MORE signal
    # than the reference's canonical 250 kS/s config; the arbitrary-rate
    # path (e.g. exactly 250 k) works via the FFT planner at ~6× the
    # cost per station (see STATUS.md measurements). 64 stations
    # amortize the band FFT/extraction fixed costs (16.8 MS/s band).
    station_chunk = 262_144
    audio_chunk = 49_152
    n_band = n_stations * station_chunk

    half = n_band // 2 - station_chunk // 2
    offsets = [int(-half + i * station_chunk) for i in range(n_stations)]

    step, state = make_multi_station_step(
        n_band, offsets, station_chunk, audio_chunk, mode="fast")

    # Synthesize the band ON DEVICE (jax.random): avoids host→device IQ
    # transfer entirely, which some TPU relay stacks reject for large
    # buffers (see runtime/transfer.py).
    @jax.jit
    def make_band(key):
        planes = 0.1 * jax.random.normal(key, (2, n_band), jnp.float32)
        return jax.lax.complex(planes[0], planes[1])

    # Vary the band in-program from a per-call scalar: the relay can
    # dedupe identical repeated (program, args) calls and report the
    # dispatch floor instead of real work (see CLAUDE.md). Threaded
    # demod state alone is not enough — it converges after one call on
    # a constant band. Verified: varied-scalar timing matches the
    # state-threaded number here (25.6 vs 25.1 ms at 64 stations).
    @jax.jit
    def step_varied(band, st, jitter):
        return step(band * (1.0 + jitter), st)

    band = make_band(jax.random.key(0))
    jax.block_until_ready(band)

    # Warmup / compile.
    audio, state = step_varied(band, state, jnp.float32(0))
    jax.block_until_ready((audio, state))

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        audio, state = step_varied(band, state, jnp.float32((i + 1) * 1e-7))
    jax.block_until_ready((audio, state))
    dt = (time.perf_counter() - t0) / iters

    # Each step processes 1 second of every station's signal.
    realtime_channels = n_stations / dt
    target_per_chip = 100 / 16  # north-star: 100 channels on v5e-16

    print(json.dumps({
        "metric": "wbfm_realtime_stereo_channels_per_chip",
        "value": round(realtime_channels, 2),
        "unit": "channels",
        "vs_baseline": round(realtime_channels / target_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
