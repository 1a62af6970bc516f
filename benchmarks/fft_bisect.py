"""Bisect the Pallas FFT kernel's hardware execution fault.

Runs ONE (batch, n, kind) case per process (a TPU-worker crash poisons
the client), printing a JSON verdict line. Driven by fft_bisect.sh.

    python benchmarks/fft_bisect.py BATCH N [fwd|inv|rfft|planar]
"""

import json
import sys


def main() -> int:
    batch, n = int(sys.argv[1]), int(sys.argv[2])
    kind = sys.argv[3] if len(sys.argv) > 3 else "fwd"

    import jax
    from radiocore_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    from radiocore_tpu.kernels import fft_pallas as _fp

    @jax.jit
    def mk(k):
        p = 0.1 * jax.random.normal(k, (2, batch, n), jnp.float32)
        return jax.lax.complex(p[0], p[1])

    x = mk(jax.random.key(batch + n))

    @jax.jit
    def diff(x):
        if kind == "inv":
            a = _fp.fft_pow2_pallas(x, sign=+1.0) / n
            b = jnp.fft.ifft(x, axis=-1)
        elif kind == "large":
            a = _fp.fft_large_pow2_pallas(x[0])
            b = jnp.fft.fft(x[0])
        elif kind == "planar":
            ar, ai = _fp.fft_pow2_pallas_planar(jnp.real(x), jnp.imag(x))
            a = jax.lax.complex(ar, ai)
            b = jnp.fft.fft(x, axis=-1)
        else:
            a = _fp.fft_pow2_pallas(x)
            b = jnp.fft.fft(x, axis=-1)
        return jnp.max(jnp.abs(a - b)), jnp.max(jnp.abs(b))

    try:
        err, ref = (float(s) for s in diff(x))
        rel = err / max(ref, 1e-30)
        print(json.dumps({"case": f"{kind} b={batch} n={n}",
                          "max_rel_err": f"{rel:.2e}",
                          "ok": bool(rel < 1e-4)}), flush=True)
        return 0
    except Exception as e:
        print(json.dumps({"case": f"{kind} b={batch} n={n}", "ok": False,
                          "err": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)
        return 1


if __name__ == "__main__":
    sys.exit(main())
