"""Relay-timing diagnostic: which measurement protocols are honest?

The TPU relay dedupes identical repeated (program, args) calls and
appears to lazily elide never-consumed outputs (CLAUDE.md). This script
times ONE expensive op (the 2^24-point band FFT) under several
protocols and prints all of them, so the honest protocol for bench.py
can be chosen from evidence:

  A. naive-repeat       — same args every call            (dedup-prone)
  B. weak-chain         — chk*1e-30 + i*1e-7 jitter       (VALUE collides:
                          1e-30 underflows against 1e-7 in f32)
  C. strong-chain       — jitter = chk*1e-3 + i*1e-7      (values differ)
  D. fresh-inputs       — new random band per call, all outputs folded
                          into one consumed scalar        (gold standard)

Each protocol reports async (total/iters, one trailing block) and, for
C/D, per-iteration blocked times. Sanity anchor: a 2^24 c64 FFT reads
and writes ≥134 MB/pass; at 819 GB/s even ONE pass is 0.164 ms and XLA
FFTs take several passes — numbers below ~1 ms are dedup artifacts.
"""

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from radiocore_tpu.ops import fft as _fft

    n = 1 << 24
    iters = 8

    @jax.jit
    def make_band(key):
        planes = 0.1 * jax.random.normal(key, (2, n), jnp.float32)
        return jax.lax.complex(planes[0], planes[1])

    @jax.jit
    def fft_step(band, j):
        s = _fft.fft(band * (1.0 + j))
        # reduce over the FULL output so no part can be skipped
        return jnp.real(jnp.sum(s[::65536])) * 1e-6 + jnp.real(s[0]) * 1e-9

    band = make_band(jax.random.key(0))
    jax.block_until_ready(band)
    c = fft_step(band, jnp.float32(0.0))
    jax.block_until_ready(c)

    def report(name, dt_async, per_iter=None):
        msg = f"{name:14s} async {dt_async * 1e3:8.2f} ms/step"
        if per_iter:
            msg += ("  blocked " +
                    " ".join(f"{d * 1e3:7.2f}" for d in per_iter))
        print(msg, flush=True)

    # A. naive repeat (identical args)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = fft_step(band, jnp.float32(1e-7))
    jax.block_until_ready(c)
    report("A naive", (time.perf_counter() - t0) / iters)

    # B. weak chain (chk*1e-30 underflows against the 1e-7 step)
    c = fft_step(band, jnp.float32(0.0))
    t0 = time.perf_counter()
    for i in range(iters):
        c = fft_step(band, c * 1e-30 + jnp.float32((i + 1) * 1e-7))
    jax.block_until_ready(c)
    report("B weak-chain", (time.perf_counter() - t0) / iters)

    # C. strong chain (audio-derived scalar actually changes the bits)
    c = fft_step(band, jnp.float32(0.0))
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    per = []
    for i in range(iters):
        t_i = time.perf_counter()
        c = fft_step(band, c * 1e-3 + jnp.float32((i + 1) * 1e-7))
        jax.block_until_ready(c)
        per.append(time.perf_counter() - t_i)
    report("C strong-chain", (time.perf_counter() - t0) / iters, per)
    print(f"  final chk value: {float(c):.6e}", flush=True)

    # C2. strong chain, async (no per-iter block)
    c = fft_step(band, jnp.float32(1e-5))
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for i in range(iters):
        c = fft_step(band, c * 1e-3 + jnp.float32((i + 1) * 1e-7))
    jax.block_until_ready(c)
    report("C2 strong-asyn", (time.perf_counter() - t0) / iters)

    # D. fresh inputs, all outputs folded into one consumed scalar
    keys = [jax.random.key(100 + i) for i in range(iters)]
    bands = None  # made inline: band gen cost measured first
    t0 = time.perf_counter()
    bs = [make_band(k) for k in keys]
    jax.block_until_ready(bs)
    gen_dt = (time.perf_counter() - t0) / iters
    print(f"  make_band: {gen_dt * 1e3:.2f} ms each", flush=True)
    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for i in range(iters):
        acc = acc + fft_step(bs[i], jnp.float32(0.0))
    jax.block_until_ready(acc)
    report("D fresh-inputs", (time.perf_counter() - t0) / iters)

    # D2. fresh inputs, per-iteration blocked
    t0 = time.perf_counter()
    per = []
    acc = jnp.float32(0.0)
    for i in range(iters):
        t_i = time.perf_counter()
        acc = acc + fft_step(bs[i], jnp.float32(1e-7))
        jax.block_until_ready(acc)
        per.append(time.perf_counter() - t_i)
    report("D2 fresh-block", (time.perf_counter() - t0) / iters, per)


if __name__ == "__main__":
    main()
