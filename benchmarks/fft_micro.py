"""FFT cost anatomy on TPU: where do the band-FFT milliseconds go?

BENCH_r02 stage profile: band FFT (2^24) 9.83 ms, extraction (incl.
64×2^18 batched IFFT) 16.27 ms — both ≥15× their HBM-traffic floors
(~0.33 ms/pass at 819 GB/s). This microbench separates the suspects,
each with the honest chained protocol (fresh input, chained scalar,
float() barriers — CLAUDE.md):

  pass0      elementwise x*phasor over the same bytes (1 read+1 write —
             the literal roofline pass, calibrates the floor)
  transpose  (4096, 4096) c64 swapaxes + copy
  bfft_4096  batched native FFT, 4096 rows of 4096 (2^24 total points)
  bfft_512   batched native FFT, 32768 rows of 512
  bfft_2e18  batched native FFT, 64 rows of 262144 (extraction's shape)
  native_2e24   single native FFT of 2^24 (bench.py band size)
  fourstep_2e24 planner four-step of 2^24 (fft_decomposed)
  pallas_b2e18  Pallas whole-row VMEM kernel, 64 rows of 262144
                (kernels/fft_pallas.py — extraction's shape)
  pallas_2e24   composed long-FFT path (matmul column FFT + Pallas
                rows + transpose) at the band size

    python benchmarks/fft_micro.py [--iters 6] [--only A,B,...]
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--n", type=int, default=1 << 24)
    parser.add_argument("--only", default=None,
                        help="comma-separated subset of case names")
    args = parser.parse_args(argv)

    import jax
    from radiocore_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    from radiocore_tpu.ops import fft as _fft
    from radiocore_tpu.kernels import fft_pallas as _fp
    from radiocore_tpu.runtime.transfer import to_host

    n = args.n

    @jax.jit
    def make(key):
        planes = 0.1 * jax.random.normal(key, (2, n), jnp.float32)
        return jax.lax.complex(planes[0], planes[1])

    def pass0(x):
        k = jax.lax.iota(jnp.float32, n) * jnp.float32(1e-7)
        return x * jax.lax.complex(jnp.cos(k), jnp.sin(k))

    cases = {
        "pass0": pass0,
        "transpose": lambda x: jnp.swapaxes(
            x.reshape(4096, -1), -1, -2).reshape(-1),
        "bfft_4096": lambda x: jnp.fft.fft(
            x.reshape(4096, -1), axis=-1).reshape(-1),
        "bfft_512": lambda x: jnp.fft.fft(
            x.reshape(-1, 512), axis=-1).reshape(-1),
        "bfft_2e18": lambda x: jnp.fft.fft(
            x.reshape(64, -1), axis=-1).reshape(-1),
        "native_2e24": lambda x: jnp.fft.fft(x),
        "fourstep_2e24": lambda x: _fft.fft_decomposed(x),
        "pallas_b2e18": lambda x: _fp.fft_pow2_pallas(
            x.reshape(64, -1)).reshape(-1),
        "pallas_2e24": lambda x: _fp.fft_large_pow2_pallas(x),
    }
    if args.only:
        keep = set(args.only.split(","))
        cases = {k: v for k, v in cases.items() if k in keep}

    def fetch(x):
        return float(to_host(x))

    iters = args.iters
    xs = [make(jax.random.key(i)) for i in range(iters + 1)]
    jax.block_until_ready(xs)
    peak = 819e9

    for name, fn in cases.items():
      try:
        @jax.jit
        def timed(x, c, _fn=fn):
            out = _fn(x * (1.0 + c * 1e-3))
            return (jnp.mean(jnp.abs(out[::65536]))
                    + jnp.real(out[0]) * 1e-3)

        chk = timed(xs[-1], jnp.float32(0))
        fetch(chk)
        epoch_means = []
        for _ in range(args.epochs):
            fetch(chk)
            t0 = time.perf_counter()
            for i in range(iters):
                chk = timed(xs[i], chk)
            fetch(chk)
            epoch_means.append((time.perf_counter() - t0) / iters)
        floor = 2 * n * 8 / peak          # one read + one write pass
        valid = [d for d in epoch_means if d >= floor] or epoch_means
        dt = min(valid)
        print(json.dumps({
            "case": name, "ms": round(dt * 1e3, 2),
            "epoch_ms": [round(d * 1e3, 2) for d in epoch_means],
            "roofline_passes": round(dt / floor, 1),
        }), flush=True)
      except Exception as e:  # one bad lowering must not kill the rest
        print(json.dumps({"case": name, "error": repr(e)[:300]}),
              flush=True)


if __name__ == "__main__":
    main()
