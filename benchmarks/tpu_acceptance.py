"""Transfer-free TPU acceptance drive.

Runs the canonical verify drives (BASELINE.md configs 1-3, plus an
MXU-precision FIR cross-check as "config 4") entirely on the
accelerator: IQ is synthesized on device (ops/synth.py), demodulated
by the jitted pipelines, and tone SNRs are measured on device — only
scalar values ever cross the host↔device boundary. This sidesteps the
relay's intermittent large-transfer failures (runtime/transfer.py) and
is therefore the reliable way to accept the framework on real TPU
hardware.

    python benchmarks/tpu_acceptance.py [--configs 1,2,3]

Prints one JSON line per check; exits non-zero on any failure.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def check(name: str, value: float, ok: bool, extra: dict | None = None):
    rec = {"check": name, "value": float(f"{float(value):.4g}"),
           "ok": bool(ok)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return ok


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--configs", default="1,2,3,4")
    args = parser.parse_args(argv)
    configs = {int(c) for c in args.configs.split(",")}

    import jax
    from radiocore_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    from radiocore_tpu.ops import synth

    t0 = time.time()
    v = jax.jit(lambda v: v + 1)(jnp.ones(8))
    jax.block_until_ready(v)
    print(json.dumps({"backend": str(jax.devices()[0]),
                      "health_s": round(time.time() - t0, 2)}), flush=True)

    ok = True
    AUDIO = 48_000

    if 1 in configs:
        # Config 1: single MFM mono, 2.4 MS/s → 48 kHz. The demodulator
        # runs at 250 kS/s after front-end decimation (reference shape,
        # examples/receive_fm.py:76-82).
        from radiocore_tpu.models.mfm import make_mfm_step, mfm_init_state
        from radiocore_tpu.ops.resample import resample_fft
        FS_IN, FS = 2_400_000, 250_000

        @jax.jit
        def config1(key):
            del key
            iq = synth.stereo_fm_iq(FS_IN, float(FS_IN), 440.0, 440.0)
            iq = resample_fft(iq, FS)
            step = make_mfm_step(FS, AUDIO)
            audio, _ = step(iq, mfm_init_state(AUDIO))  # (AUDIO,) mono
            return synth.tone_snr_db(audio, AUDIO, 440.0)

        t0 = time.time()
        snr = float(config1(jax.random.key(0)))
        ok &= check("config1_mfm_mono_snr_db", snr, snr > 20.0,
                    {"compile_and_run_s": round(time.time() - t0, 1)})

    if 2 in configs:
        # Config 2: WBFM stereo + pilot PLL + de-emphasis (exact + fast).
        from radiocore_tpu.models.wbfm import make_wbfm_step, wbfm_init_state
        FS = 250_000
        for mode in ("exact", "fast"):
            @jax.jit
            def config2(key, _mode=mode):
                del key
                iq = synth.stereo_fm_iq(FS, float(FS), 440.0, 1000.0)
                step = make_wbfm_step(FS, AUDIO, mode=_mode)
                audio, _ = step(iq, wbfm_init_state(AUDIO))
                return (synth.tone_snr_db(audio[:, 0], AUDIO, 440.0),
                        synth.tone_snr_db(audio[:, 1], AUDIO, 1000.0),
                        synth.tone_snr_db(audio[:, 1], AUDIO, 440.0))

            t0 = time.time()
            l, r, leak = (float(x) for x in config2(jax.random.key(0)))
            dt = round(time.time() - t0, 1)
            ok &= check(f"config2_wbfm_{mode}_left_snr_db", l, l > 20.0,
                        {"compile_and_run_s": dt})
            ok &= check(f"config2_wbfm_{mode}_right_snr_db", r, r > 20.0)
            ok &= check(f"config2_wbfm_{mode}_separation_db", r - leak,
                        r - leak > 10.0)

    if 3 in configs:
        # Config 3: channelize a multi-station band, batched WBFM. The
        # stations are synthesized directly at their station rate and
        # frequency-stacked on device via the same spectrum layout the
        # extractor inverts (pow2 rates → native FFTs).
        from radiocore_tpu.parallel.pipeline import make_multi_station_step
        n_st, st_chunk, audio_chunk = 8, 262_144, 49_152
        n_band = n_st * st_chunk
        half = n_band // 2 - st_chunk // 2
        offsets = [int(-half + i * st_chunk) for i in range(n_st)]
        tones = [(300.0 + 50 * i, 700.0 + 80 * i) for i in range(n_st)]

        step, state = make_multi_station_step(
            n_band, offsets, st_chunk, audio_chunk, mode="fast")

        @jax.jit
        def make_band(key):
            del key
            parts = []
            for (fl, fr) in tones:
                iq = synth.stereo_fm_iq(st_chunk, float(st_chunk), fl, fr)
                parts.append(jnp.fft.fft(iq))
            # Stack each station's spectrum at its offset in the band
            # (static indices — offsets are Python ints).
            band_spec = jnp.zeros(n_band, jnp.complex64)
            h = st_chunk // 2
            for off, spec in zip(offsets, parts):
                start = (off % n_band - h) % n_band
                assert start + st_chunk <= n_band, (off, start)
                lo = jnp.fft.fftshift(spec)  # [-h, h) bin order
                band_spec = band_spec.at[start:start + st_chunk].set(lo)
            return jnp.fft.ifft(band_spec).astype(jnp.complex64)

        band = make_band(jax.random.key(0))
        jax.block_until_ready(band)
        t0 = time.time()
        audio, state = step(band, state)
        jax.block_until_ready(audio)
        dt = round(time.time() - t0, 1)

        @jax.jit
        def snrs(audio):
            out = []
            for i, (fl, fr) in enumerate(tones):
                out.append(synth.tone_snr_db(audio[i, :, 0],
                                             audio_chunk, fl))
                out.append(synth.tone_snr_db(audio[i, :, 1],
                                             audio_chunk, fr))
            return jnp.stack(out)

        vals = [float(x) for x in snrs(audio)]
        worst = min(vals)
        ok &= check("config3_8station_worst_tone_snr_db", worst,
                    worst > 15.0, {"compile_and_run_s": dt,
                                   "stations": n_st})

    if 4 in configs:
        # MXU-precision cross-check: Pallas banded-matmul FIR vs the FFT
        # overlap-save form — two independent lowerings whose agreement
        # bounds both at f32 accuracy. Guards the regression found on
        # v5e (2026-08-19): DEFAULT-precision MXU contractions round f32
        # inputs to bf16 (~3e-3 rel error vs a float64 oracle), which an
        # XLA-conv reference can't see because conv rounds identically.
        import numpy as np
        from scipy import signal as sig
        from radiocore_tpu.ops.fir import fir_overlap_save
        from radiocore_tpu.kernels.fir_pallas import fir_causal_pallas

        taps = sig.firwin(257, 0.25).astype(np.float32)

        @jax.jit
        def fir_crosscheck(key):
            x = jax.random.normal(key, (4, 262_144), jnp.float32)
            a = fir_causal_pallas(x, taps)
            c = fir_overlap_save(x, taps)
            return jnp.max(jnp.abs(a - c)) / jnp.max(jnp.abs(c))

        rel = float(fir_crosscheck(jax.random.key(2)))
        ok &= check("config4_fir_mxu_precision_rel_err", rel, rel < 1e-5,
                    {"taps": 257, "note": "pallas vs fft-overlap-save"})

    print(json.dumps({"acceptance": "PASS" if ok else "FAIL"}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
