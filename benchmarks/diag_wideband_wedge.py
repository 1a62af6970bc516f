"""Diagnose WHY the config-4 wideband program wedges its process's D2H.

Three rounds of relay runs (r2 + r3) died at the first scalar fetch
after executing the wideband step, while trivial programs in fresh
processes fetch fine — so the program itself induces a process-level
D2H wedge. This script bisects: it executes progressively larger
subsets of the wideband step and probes D2H (of an INDEPENDENT trivial
value, then of the dependent scalar) after each.

    python benchmarks/diag_wideband_wedge.py [--stage N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def probe(tag, fn):
    t0 = time.perf_counter()
    try:
        v = fn()
        print(json.dumps({"probe": tag, "ok": True, "value": repr(v)[:40],
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)
        return True
    except Exception as e:
        print(json.dumps({"probe": tag, "ok": False,
                          "err": f"{type(e).__name__}: {e}"[:90],
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)
        return False


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--stage", type=int, default=99,
                        help="run stages up to N (each stage adds work)")
    parser.add_argument("--n", type=int, default=8 << 20)
    args = parser.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from scipy import signal as sig

    n, m = args.n, 64
    probe("baseline tiny", lambda: float(
        jax.jit(lambda v: v + 1)(jnp.ones(8)).sum()))

    @jax.jit
    def make_band(key):
        planes = 0.1 * jax.random.normal(key, (2, n), jnp.float32)
        return jax.lax.complex(planes[0], planes[1])

    band = make_band(jax.random.key(0))
    jax.block_until_ready(band)
    probe("after make_band", lambda: float(
        jax.jit(lambda v: v + 2)(jnp.ones(8)).sum()))

    stages = []

    if args.stage >= 1:
        from radiocore_tpu.ops.fir import fir_overlap_save
        fir = sig.firwin(129, 0.45)

        @jax.jit
        def s1(b):
            y = fir_overlap_save(b, fir)
            return jnp.mean(jnp.abs(y[::4096]))
        stages.append(("fir_overlap_save", s1))

    if args.stage >= 2:
        from radiocore_tpu.ops import fft as _fft

        @jax.jit
        def s2(b):
            return jnp.mean(jnp.abs(_fft.fft(b)[::4096]))
        stages.append(("band fft", s2))

    if args.stage >= 3:
        from radiocore_tpu.ops import fft as _fft
        from radiocore_tpu.ops.channelize import make_extractor
        chunk = n // m
        grid = [((k * chunk + n // 2) % n) - n // 2 for k in range(m)]
        extract = make_extractor(n, tuple(-g for g in grid), chunk)

        @jax.jit
        def s3(b):
            ch = extract(_fft.fft(b))
            return jnp.mean(jnp.abs(ch.ravel()[::4096]))
        stages.append(("fft+extract", s3))

    if args.stage >= 4:
        from radiocore_tpu.ops import fft as _fft
        from radiocore_tpu.ops.fir import fir_overlap_save
        from radiocore_tpu.ops.channelize import make_extractor
        fir = sig.firwin(129, 0.45)
        chunk = n // m
        grid = [((k * chunk + n // 2) % n) - n // 2 for k in range(m)]
        extract = make_extractor(n, tuple(-g for g in grid), chunk)

        @jax.jit
        def s4(b):
            ch = extract(_fft.fft(fir_overlap_save(b, fir)))
            ch = jnp.swapaxes(ch, -1, -2)
            return (jnp.mean(jnp.abs(ch.ravel()[::4096]))
                    + jnp.real(ch.ravel()[0]) * 1e-3)
        stages.append(("full wideband step", s4))

    for tag, fn in stages:
        t0 = time.perf_counter()
        chk = fn(band)
        ok_blk = probe(f"{tag}: block_until_ready(chk)",
                       lambda: jax.block_until_ready(chk) is not None)
        probe(f"{tag}: independent tiny D2H", lambda: float(
            jax.jit(lambda v: v + 3)(jnp.ones(8)).sum()))
        probe(f"{tag}: float(chk)", lambda: float(np.asarray(chk)))
        print(json.dumps({"stage": tag,
                          "wall_s": round(time.perf_counter() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
