"""Compile-only smoke stage for the TPU queue head (no fetches).

For each kernel/pipeline variant the queue will exercise, AOT-compile
the jitted program on the active backend and report per-variant
ok/seconds — a Mosaic lowering bug (like r3's f32 ``tpu.iota``) then
costs ~a minute at queue head instead of a whole benchmark wave. As a
side effect, every compile lands in the persistent cache, so the real
benchmark runs start warm.

    python benchmarks/smoke_compile.py [--only a,b] [--stations 64]

Prints one JSON line per variant; exit code = number of failures.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--stations", type=int, default=64)
    parser.add_argument("--station-chunk", type=int, default=262_144)
    parser.add_argument("--only", default=None,
                        help="comma-separated subset of variant names")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (script self-test; "
                             "env vars alone can't override sitecustomize)")
    args = parser.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from radiocore_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    c = args.stations
    m = args.station_chunk
    n = c * m
    half = n // 2 - m // 2
    offsets = [int(-half + i * m) for i in range(c)]

    print(json.dumps({"backend": str(jax.devices()[0]),
                      "stage": "smoke-compile"}), flush=True)

    def build_pipeline(env: dict):
        """(Re)build the fused step under the given env knobs."""
        import os
        from radiocore_tpu.ops import channelize
        from radiocore_tpu.parallel.pipeline import make_multi_station_step
        saved = {}
        keys = ("RADIOCORE_TPU_EXTRACT_IFFT", "RADIOCORE_TPU_FFT_PALLAS_MIN",
                "RADIOCORE_TPU_FIR_IMPL", "RADIOCORE_TPU_STATION_RFFT")
        for k in keys:
            saved[k] = os.environ.pop(k, None)
        os.environ.update(env)
        channelize.make_extractor.cache_clear()
        try:
            step, state0 = make_multi_station_step(
                n, offsets, m, m * 3 // 16, mode="fast")
            return step, state0
        finally:
            for k in keys:
                os.environ.pop(k, None)
                if saved[k] is not None:
                    os.environ[k] = saved[k]
            channelize.make_extractor.cache_clear()

    def compile_pipeline(env):
        step, state0 = build_pipeline(env)
        band = jax.ShapeDtypeStruct((n,), jnp.complex64)
        st = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state0)
        jax.jit(step).lower(band, st).compile()

    def compile_fft_kernel():
        from radiocore_tpu.kernels.fft_pallas import fft_pow2_pallas_planar
        x = jax.ShapeDtypeStruct((c, m), jnp.float32)

        def f(xr, xi):
            return fft_pow2_pallas_planar(xr, xi, +1.0)
        jax.jit(f).lower(x, x).compile()

    def compile_fft_kernel_grouped():
        # Short rows → grouped grid steps (incl. the pad path).
        from radiocore_tpu.kernels.fft_pallas import fft_pow2_pallas_planar
        x = jax.ShapeDtypeStruct((61, 8192), jnp.float32)

        def f(xr, xi):
            return fft_pow2_pallas_planar(xr, xi, -1.0)
        jax.jit(f).lower(x, x).compile()

    def compile_fused_extract():
        from radiocore_tpu.kernels.extract_pallas import extract_rows_pallas
        spec = jax.ShapeDtypeStruct((n,), jnp.complex64)
        a0 = (half + n // 2) % n  # m-aligned for the uniform plan

        def f(s):
            return extract_rows_pallas(s, (n - half) % n, c, m,
                                       1.0 / ((n / m) * m))
        jax.jit(f).lower(spec).compile()

    def compile_fused_extract_demod():
        from radiocore_tpu.kernels.extract_demod_pallas import (
            extract_demod_rows_pallas)
        spec = jax.ShapeDtypeStruct((n,), jnp.complex64)

        def f(s):
            return extract_demod_rows_pallas(s, (n - half) % n, c, m)
        jax.jit(f).lower(spec).compile()

    def compile_fused_extract_demod_spec():
        from radiocore_tpu.kernels.extract_demod_pallas import (
            extract_demod_spec_rows_pallas)
        spec = jax.ShapeDtypeStruct((n,), jnp.complex64)

        def f(s):
            return extract_demod_spec_rows_pallas(s, (n - half) % n, c, m)
        jax.jit(f).lower(spec).compile()

    def compile_fft_mixed():
        # 96-station band class: 24M = 48·2^19 mixed-radix four-step.
        from radiocore_tpu.kernels.fft_pallas import fft_large_mixed_pallas
        x = jax.ShapeDtypeStruct((3 << 23,), jnp.complex64)
        jax.jit(lambda v: fft_large_mixed_pallas(v)).lower(x).compile()

    def compile_fir_kernel():
        from radiocore_tpu.kernels.fir_pallas import fir_causal_pallas
        import numpy as np
        x = jax.ShapeDtypeStruct((1 << 22,), jnp.float32)
        taps = np.hanning(129).astype(np.float32)

        def f(v):
            return fir_causal_pallas(v, taps)
        jax.jit(f).lower(x).compile()

    def _load_bench_module(name):
        # Explicit-path import: a bare ``sys.path.insert + import`` can
        # shadow same-named modules and permanently mutates sys.path
        # (ADVICE r4).
        import importlib.util
        from pathlib import Path
        path = Path(__file__).resolve().parent / f"{name}.py"
        spec = importlib.util.spec_from_file_location(
            f"_smoke_{name}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def compile_wideband(chz):
        # AOT-compile the EXACT device-loop programs the benchmark runs
        # (shared construction: benchmarks/wideband.py build_single), so
        # the real run starts cache-warm — long in-process compiles
        # correlate with first-fetch D2H deaths (r3/r4 queue logs).
        _wb = _load_bench_module("wideband")
        nn = _wb.plan_n(61.44e6, 0.25, 64, chz)
        run_k, hist0 = _wb.build_single(chz, nn, 64)
        band = jax.ShapeDtypeStruct((nn,), jnp.complex64)
        h = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), hist0)
        c0 = jax.ShapeDtypeStruct((), jnp.float32)
        for k in (2, 10):
            run_k.lower(band, h, c0, k=k).compile()

    def compile_wideband_bench(chz, fir):
        # bench.py-protocol config-4 harness (wideband_bench.py): warm
        # the per-call chained step exactly as the benchmark builds it.
        _wb = _load_bench_module("wideband_bench")
        nn = _wb.plan_n(61.44e6, 0.25, 64, chz)
        step, hist0 = _wb.build_step(chz, fir, nn, 64)
        import jax.numpy as _jnp

        band = jax.ShapeDtypeStruct((nn,), jnp.complex64)
        c0 = jax.ShapeDtypeStruct((), jnp.float32)
        if hist0 is None:                     # stateless fft form
            def chained(band, c0):
                ch = step(band * (1.0 + c0 * 1e-3))
                chk = _jnp.mean(_jnp.abs(ch.ravel()[::4096])) \
                    + _jnp.real(ch.ravel()[0]) * 1e-3
                return ch, chk
            jax.jit(chained).lower(band, c0).compile()
        else:
            def chained(band, h, c0):
                ch, h2 = step(band * (1.0 + c0 * 1e-3), h)
                chk = _jnp.mean(_jnp.abs(ch.ravel()[::4096])) \
                    + _jnp.real(ch.ravel()[0]) * 1e-3
                return ch, h2, chk
            h = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), hist0)
            jax.jit(chained).lower(band, h, c0).compile()

    variants = {
        "fft_kernel": compile_fft_kernel,
        "fft_kernel_grouped": compile_fft_kernel_grouped,
        "fused_extract": compile_fused_extract,
        "fused_extract_demod": compile_fused_extract_demod,
        "fused_extract_demod_spec": compile_fused_extract_demod_spec,
        "fir_kernel": compile_fir_kernel,
        "fft_mixed": compile_fft_mixed,
        "pipeline_default": lambda: compile_pipeline({}),
        "pipeline_fused": lambda: compile_pipeline(
            {"RADIOCORE_TPU_EXTRACT_IFFT": "fused"}),
        "pipeline_all_pallas": lambda: compile_pipeline(
            {"RADIOCORE_TPU_EXTRACT_IFFT": "fused",
             "RADIOCORE_TPU_FFT_PALLAS_MIN": "65536"}),
        "pipeline_prfft": lambda: compile_pipeline(
            {"RADIOCORE_TPU_STATION_RFFT": "pallas"}),
        "wideband_fft": lambda: compile_wideband("fft"),
        "wideband_pfb": lambda: compile_wideband("pfb"),
        "wb_bench_fft": lambda: compile_wideband_bench("fft", "pallas"),
        "wb_bench_nofir": lambda: compile_wideband_bench("fft", "none"),
        "wb_bench_pfb": lambda: compile_wideband_bench("pfb", "pallas"),
    }
    if args.only:
        keep = set(args.only.split(","))
        variants = {k: v for k, v in variants.items() if k in keep}

    fails = 0
    for name, fn in variants.items():
        t0 = time.perf_counter()
        try:
            fn()
            print(json.dumps({"variant": name, "ok": True,
                              "s": round(time.perf_counter() - t0, 1)}),
                  flush=True)
        except Exception as e:
            fails += 1
            print(json.dumps({"variant": name, "ok": False,
                              "s": round(time.perf_counter() - t0, 1),
                              "err": f"{type(e).__name__}: {e}"[-600:]}),
                  flush=True)
    print(json.dumps({"stage": "smoke-compile", "fails": fails}),
          flush=True)
    # Always exit 0: the per-variant records ARE the product; a queue
    # wrapper must not discard them because one variant failed.
    return 0


if __name__ == "__main__":
    sys.exit(main())
