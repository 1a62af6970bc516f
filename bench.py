"""Benchmark: real-time WBFM stereo channels per chip (fused pipeline).

Runs the fused channelize+demod pipeline (full-band FFT → all-stations
spectrum extraction → batched WBFM stereo demod) on the default
accelerator and reports how many 262 kS/s WBFM stereo stations one chip
sustains in real time (1 s of IQ processed per wall-clock second).

Baseline: the reference publishes no numbers (BASELINE.md); the
comparison point is the project north-star target of ≥100 real-time
channels on a v5e-16, i.e. 6.25 channels/chip — ``vs_baseline`` is the
measured value over that target.

Measurement protocol (evidence in benchmarks/diag_relay.py; traps in
CLAUDE.md): the TPU relay dedupes repeated (program, args) calls and can
lazily elide never-consumed outputs, and its latency oscillates between
healthy and degraded windows on a minutes timescale. Every timed epoch
therefore uses
  1. a FRESH pre-generated random band per call (no two calls share
     input values — dedup impossible),
  2. the demod state pytree + an audio-derived scalar chained from each
     call into the next call's input (strictly serial dependency — no
     call can be skipped or reordered),
  3. async issue with ONE trailing block_until_ready on the chained
     scalar (per-iteration blocking only measures relay round-trips),
  4. several epochs, reporting the MINIMUM epoch mean (rides out
     degraded relay windows; the min is still a real end-to-end time),
  5. a hard HBM-roofline guard: a step faster than a single read pass
     of the band at peak HBM bandwidth is physically impossible and is
     refused (``"suspect": true`` + the slowest epoch reported).

Prints ONE JSON line to stdout. Diagnostics go to stderr.
"""

import json
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# Known per-chip HBM peak bandwidth by device_kind substring (bytes/s).
HBM_PEAK = {"TPU v5 lite": 819e9, "TPU v5e": 819e9,
            "TPU v4": 1228e9, "TPU v6": 1640e9}


def hbm_peak_bytes_per_s(device):
    kind = getattr(device, "device_kind", "")
    for k, v in HBM_PEAK.items():
        if k in kind:
            return v
    return None


def main() -> None:
    import os
    import jax

    # Persistent compiled-program cache: remote TPU compiles in this
    # environment can take minutes, and repeat bench runs are identical.
    from radiocore_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax.numpy as jnp
    from radiocore_tpu.parallel.pipeline import make_multi_station_step

    n_stations = int(os.environ.get("RADIOCORE_TPU_BENCH_STATIONS", 64))
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

    step, state0 = make_multi_station_step(
        n_band, offsets, station_chunk, audio_chunk, mode="fast")

    # Config-4 variant (BASELINE.md): a band-rate overlap-save FIR in
    # front of the channelizer. Riding inside THIS program matters: it
    # is the one program whose scalars the relay has fetched reliably
    # for five rounds, while every standalone wideband harness — any
    # protocol, size, state or fetch-laundering variant — wedges its
    # session's D2H (bench_logs/tpu_queue_r5.log, waves 1-1.6). The
    # demod tail rides along, so the step time OVERSTATES the config-4
    # front-end cost (honest direction).
    band_fir_taps = int(os.environ.get("RADIOCORE_TPU_BENCH_BAND_FIR",
                                       0))
    if band_fir_taps:
        from scipy import signal as _sig
        import numpy as _np
        from radiocore_tpu.ops.fir import fir_causal
        _fir = _sig.firwin(band_fir_taps, 0.45).astype(_np.float32)
        _inner = step

        @jax.jit
        def step(band, st):
            planes = jnp.stack([jnp.real(band), jnp.imag(band)])
            f = fir_causal(planes, _fir)
            return _inner(jax.lax.complex(f[0], f[1]), st)

    # Bands are synthesized ON DEVICE (jax.random): avoids host→device
    # IQ transfer entirely, which the relay rejects for large buffers.
    @jax.jit
    def make_band(key):
        planes = 0.1 * jax.random.normal(key, (2, n_band), jnp.float32)
        return jax.lax.complex(planes[0], planes[1])

    # chk scale ~O(1); c*1e-3 perturbs the input at a level that does
    # NOT underflow against f32 resolution (1e-30 would — see
    # benchmarks/diag_relay.py protocol B).
    @jax.jit
    def step_chained(band, st, c):
        audio, st2 = step(band * (1.0 + c * 1e-3), st)
        chk = jnp.mean(jnp.abs(audio)) + audio[0, 0, 0] * 1e-3
        return audio, st2, chk

    iters, epochs = 8, 4
    keys = [jax.random.key(i) for i in range(iters + 1)]
    t0 = time.perf_counter()
    bands = [make_band(k) for k in keys]
    jax.block_until_ready(bands)
    log(f"bands: {iters + 1} × {n_band * 8 / 1e6:.0f} MB "
        f"in {time.perf_counter() - t0:.2f} s")

    # Warmup / compile.
    t0 = time.perf_counter()
    audio, state, chk = step_chained(bands[-1], state0, jnp.float32(0))
    jax.block_until_ready(chk)
    log(f"compile+first-step: {time.perf_counter() - t0:.2f} s")

    # Resilient scalar fetch: the relay's D2H fails transiently even for
    # scalars (oscillating windows — CLAUDE.md); to_host retries before
    # giving up. Still a HARD barrier (the value must materialize).
    from radiocore_tpu.runtime.transfer import to_host

    def fetch(c):
        return float(to_host(c))

    def run_epoch(state, chk):
        # fetch() is a HARD barrier: the relay must complete the whole
        # dependency chain to produce the value (block_until_ready alone
        # has been observed to return before deferred relay work runs —
        # epoch-0 artifact in BENCH history). Drain before starting the
        # clock, and fetch the final value inside the timed window.
        fetch(chk)
        t0 = time.perf_counter()
        for i in range(iters):
            audio, state, chk = step_chained(bands[i], state, chk)
        chk_val = fetch(chk)
        return (time.perf_counter() - t0) / iters, state, chk, chk_val

    epoch_means = []
    for e in range(epochs):
        dt_e, state, chk, chk_val = run_epoch(state, chk)
        epoch_means.append(dt_e)
        log(f"epoch {e}: {dt_e * 1e3:.2f} ms/step  (chk={chk_val:.4e})")

    # ---- HBM roofline guard -------------------------------------------
    # Absolute floor: ONE read pass over the c64 band. Any dt below
    # min_bytes/peak is physically impossible on this chip; real steps
    # also write/read the spectrum and station/audio arrays, so honest
    # numbers sit well above the floor. The headline is the FASTEST
    # epoch that clears the floor (rides out degraded relay windows);
    # only if no epoch clears it is the slowest reported, as suspect.
    dev = jax.devices()[0]
    peak = hbm_peak_bytes_per_s(dev)
    suspect = False
    dt = min(epoch_means)
    if peak is not None:
        floor = n_band * 8 / peak
        log(f"roofline floor ({dev.device_kind}): {floor * 1e3:.3f} ms "
            f"for a single {n_band * 8 / 1e6:.0f} MB band read")
        valid = [d for d in epoch_means if d >= floor]
        if valid:
            if dt < floor:
                log(f"dropped {sum(1 for d in epoch_means if d < floor)} "
                    f"epoch(s) below the roofline floor")
            dt = min(valid)
        else:
            log("ALL epochs beat the roofline — physically impossible; "
                "reporting the slowest and marking suspect")
            dt = max(epoch_means)
            suspect = True

    # ---- stage profile (same fresh+chained protocol per stage) --------
    stage_profile = {}
    try:
        from radiocore_tpu.ops import fft as _fft
        from radiocore_tpu.ops.channelize import make_extractor
        from radiocore_tpu.models.wbfm import make_wbfm_step, wbfm_init_state

        extract = make_extractor(
            int(n_band), tuple(int(-o) for o in offsets), int(station_chunk))
        wbfm = jax.vmap(make_wbfm_step(station_chunk, audio_chunk,
                                       mode="fast"))

        @jax.jit
        def s_fft(b, c):
            s = _fft.fft(b * (1.0 + c * 1e-3))
            return s, jnp.mean(jnp.abs(s[::65536]))

        @jax.jit
        def s_extract(s, c):
            ch = extract(s * (1.0 + c * 1e-3))
            return ch, jnp.mean(jnp.abs(ch[:, ::4096]))

        st_w = wbfm_init_state(audio_chunk, batch_shape=(n_stations,))

        @jax.jit
        def s_demod(ch, st, c):
            a, st2 = wbfm(ch * (1.0 + c * 1e-3), st)
            return a, st2, jnp.mean(jnp.abs(a))

        def time_stage(fn, inputs, *extra):
            carried = list(extra)
            c = jnp.float32(0)
            outs = []
            # compile + hard drain (float() barrier, see run_epoch)
            r = fn(inputs[-1], *carried, c)
            fetch(r[-1])
            t0 = time.perf_counter()
            for x in inputs[:-1]:
                r = fn(x, *carried, c)
                outs.append(r[0])
                if len(r) == 3:
                    carried = [r[1]]
                c = r[-1]
            fetch(c)
            return (time.perf_counter() - t0) / (len(inputs) - 1), outs

        dt_f, spectra = time_stage(lambda b, c: s_fft(b, c), bands)
        stage_profile["band_fft_ms"] = round(dt_f * 1e3, 2)
        dt_x, chans = time_stage(lambda s, c: s_extract(s, c), spectra + [spectra[-1]])
        stage_profile["extract_ms"] = round(dt_x * 1e3, 2)
        dt_d, _ = time_stage(lambda ch, st, c: s_demod(ch, st, c),
                             chans + [chans[-1]], st_w)
        stage_profile["demod_ms"] = round(dt_d * 1e3, 2)
        log(f"stage profile: {stage_profile}")

        # Cross-check: the fused step should cost no less than ~50% of
        # the stage sum (fusion saves HBM round-trips, not compute).
        stage_sum = sum(stage_profile.values()) / 1e3
        if peak is not None and dt < 0.5 * stage_sum:
            log(f"fused dt {dt * 1e3:.2f} ms < 50% of stage sum "
                f"{stage_sum * 1e3:.2f} ms — marking suspect")
            suspect = True
    except Exception as e:  # profile is diagnostics, never fatal
        log(f"stage profile skipped: {e!r}")

    # Each step processes 1 second of every station's signal.
    realtime_channels = n_stations / dt
    target_per_chip = 100 / 16  # north-star: 100 channels on v5e-16

    result = {
        "metric": "wbfm_realtime_stereo_channels_per_chip",
        "value": round(realtime_channels, 2),
        "band_fir_taps": band_fir_taps,
        "unit": "channels",
        "vs_baseline": round(realtime_channels / target_per_chip, 3),
        "sec_per_step": round(dt, 5),
        "epoch_ms": [round(d * 1e3, 2) for d in epoch_means],
        "protocol": "fresh-band+chained-state, min of epochs",
        "stage_profile_ms": stage_profile,
        # The stage profile times each stage as its OWN jitted program
        # (jit boundaries pin layouts and forbid cross-stage fusion), so
        # the stage sum exceeds the fused step and individual stages can
        # drift with relay load while the fused headline holds (r3:
        # demod 8→12.6 ms in the profile, fused step flat). Use it to
        # RANK stages, not to account for the fused step's time.
        "stage_protocol": "per-stage jits; sum != fused step",
    }
    if suspect:
        result["suspect"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    main()
