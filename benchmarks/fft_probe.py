"""Probe: native XLA FFT vs four-step decomposition at wideband sizes.

XLA's native large single-FFT lowering on TPU is several times off the
HBM roofline at 2^22+ and scales superlinearly (the measured cause of
the 128-station single-chip regression, STATUS.md r1). The four-step
form is two batched small FFTs + twiddle + transposes — all
bandwidth-shaped ops XLA tiles well. This probe times both per size with
the honest relay protocol (fresh inputs, output-derived chaining,
float() barriers) and prints one JSON line per (size, impl).

    python benchmarks/fft_probe.py --sizes 22 23 24 25
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sizes", type=int, nargs="+",
                        default=[22, 24, 25],
                        help="log2 of FFT sizes to probe")
    parser.add_argument("--raw-sizes", type=int, nargs="*", default=[],
                        help="absolute FFT sizes (for non-pow2 probes, "
                             "e.g. the 96-station 24M band)")
    parser.add_argument("--impls", default="native,fourstep",
                        help="comma list of native,fourstep,mixed")
    parser.add_argument("--iters", type=int, default=6)
    args = parser.parse_args(argv)

    import jax
    from radiocore_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    from radiocore_tpu.ops import fft as _fft

    dev = jax.devices()[0]
    print(json.dumps({"backend": str(dev)}), flush=True)
    peak = 819e9 if "v5" in getattr(dev, "device_kind", "") else None

    sizes = [1 << lg for lg in args.sizes] + list(args.raw_sizes)
    impls = args.impls.split(",")
    for n in sizes:

        @jax.jit
        def make(key, _n=n):
            planes = jax.random.normal(key, (2, _n), jnp.float32)
            return jax.lax.complex(planes[0], planes[1])

        xs = [make(jax.random.key(i)) for i in range(args.iters + 1)]
        jax.block_until_ready(xs)

        for policy in impls:
            if policy != "mixed":
                _fft.set_policy(policy)
            try:
                if policy == "mixed":
                    # Pallas mixed-radix large FFT: a·2^k column DFT on
                    # the MXU + pow2 VMEM kernel rows.
                    from radiocore_tpu.kernels.fft_pallas import (
                        fft_large_mixed_pallas)

                    @jax.jit
                    def f(x, c):
                        y = fft_large_mixed_pallas(x * (1.0 + c * 1e-3))
                        return jnp.mean(jnp.abs(y[::65536])) + \
                            jnp.real(y[0]) * 1e-6
                else:
                    @jax.jit
                    def f(x, c):
                        y = _fft.fft(x * (1.0 + c * 1e-3))
                        return jnp.mean(jnp.abs(y[::65536])) + \
                            jnp.real(y[0]) * 1e-6

                c = f(xs[-1], jnp.float32(0))
                float(c)  # compile + drain
                best = None
                for _ in range(2):
                    float(c)
                    t0 = time.perf_counter()
                    for i in range(args.iters):
                        c = f(xs[i], c)
                    float(c)
                    dt = (time.perf_counter() - t0) / args.iters
                    best = dt if best is None else min(best, dt)
                row = {"n": n, "impl": policy,
                       "ms": round(best * 1e3, 3),
                       "eff_gb_per_s": round(2 * n * 8 / best / 1e9, 1)}
                if peak:
                    # floor: one read+write pass of the c64 array
                    row["suspect"] = best < 2 * n * 8 / peak
                print(json.dumps(row), flush=True)
            except Exception as e:
                print(json.dumps({"n": n, "impl": policy,
                                  "error": repr(e)[:200]}), flush=True)
            finally:
                _fft.set_policy("auto")
    return 0


if __name__ == "__main__":
    sys.exit(main())
