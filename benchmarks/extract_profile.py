"""Sub-stage profile of the extraction stage (the fused pipeline's
dominant cost: 16.27 of 25.2 ms at 64 stations, BENCH_r02.json).

Decomposes ``ops.channelize.make_extractor`` (band spectrum →
(C, m) station IQ) into its parts and times alternative lowerings of
the batched station IFFT on hardware, all with the honest chained
protocol (fresh inputs per call; a scalar derived from the expensive
output folded into the next call's input; float() hard barriers —
CLAUDE.md relay traps):

  reorder   window/reorder/Nyquist-fix only (no IFFT)
  native    jnp.fft.ifft on (C, m) directly (the r2 lowering)
  fourstep  m = n1·n2 split: two batched small native FFTs + on-the-fly
            twiddle + transposes (no custom-call pass over a 2^18 axis)
  pallas    whole-row VMEM MXU kernel (kernels/fft_pallas.py): one HBM
            read+write per row, butterflies on-chip
  full      the shipped extractor (for cross-check)

    python benchmarks/extract_profile.py [--stations 64] [--iters 6]

Prints one JSON line per variant. Minimum honest HBM traffic per
variant is reported as gb_per_s (read+write of the (C, m) c64 array).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--stations", type=int, default=64)
    parser.add_argument("--station-chunk", type=int, default=262_144)
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--epochs", type=int, default=3)
    args = parser.parse_args(argv)

    import jax
    from radiocore_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    from radiocore_tpu.ops.channelize import extraction_plan, make_extractor
    from radiocore_tpu.runtime.transfer import to_host

    c = args.stations
    m = args.station_chunk
    n = c * m
    half = n // 2 - m // 2
    offsets = [int(-half + i * m) for i in range(c)]
    shifts = tuple(int(-o) for o in offsets)
    starts, w_out, w_fix, m2, _run = extraction_plan(n, shifts, m)
    neg = m - m2
    s_fac = n / m
    a0 = starts[0]

    @jax.jit
    def make_spec(key):
        planes = 0.1 * jax.random.normal(key, (2, n), jnp.float32)
        return jax.lax.complex(planes[0], planes[1])

    def reorder_only(spectrum):
        """extract_uniform minus the IFFT: windowed (C, m) rows."""
        need = c * m + 1
        base = jnp.concatenate(
            [spectrum[a0:], spectrum[:a0], spectrum[a0:a0 + 1]])[:need]
        rows = base[:c * m].reshape(c, m)
        nxt = jnp.concatenate([rows[1:, :1], base[None, -1:]], axis=0)
        if m % 2 == 0:
            pos = jnp.concatenate([rows[:, m // 2:], nxt], axis=-1)
            y = jnp.concatenate([pos, rows[:, 1:m // 2]], axis=-1) * w_out
            y = y.at[:, m2 - 1].add(rows[:, 0] * w_fix)
        else:
            pos = jnp.concatenate([rows[:, neg:], nxt], axis=-1)[:, :m2]
            y = jnp.concatenate([pos, rows[:, :neg]], axis=-1) * w_out
        return y

    from radiocore_tpu.ops import fft as _fft
    extract_full = make_extractor(n, shifts, m)

    # Kernel imports are DEFERRED into the variant bodies: an
    # unavailable kernel must only drop its own variant, not kill the
    # whole profile (r3 lesson — a kernel ImportError took out the
    # previously-working reorder/native/fourstep/full rows too).
    def _pallas_variant(s):
        from radiocore_tpu.kernels.fft_pallas import fft_pow2_pallas
        return fft_pow2_pallas(reorder_only(s) / (s_fac * m), sign=+1.0)

    def _fused_variant(s):
        # Slice+window+fix+IFFT in ONE kernel pass (no XLA reorder).
        from radiocore_tpu.kernels.extract_pallas import extract_rows_pallas
        return extract_rows_pallas(s, a0, c, m, 1.0 / (s_fac * m))

    def _fused_demod_variant(s):
        # One stage FURTHER: extraction + FM quadrature demod in the
        # same pass (station IQ never touches HBM; output is f32 quad).
        # Not extraction-equivalent — compare as "front-end cost".
        from radiocore_tpu.kernels.extract_demod_pallas import (
            extract_demod_rows_pallas)
        return extract_demod_rows_pallas(s, a0, c, m)

    def _fused_spec_variant(s):
        # Furthest: extraction + demod + forward transform; output is
        # each station's composite spectrum (the fast-WBFM tail input).
        from radiocore_tpu.kernels.extract_demod_pallas import (
            extract_demod_spec_rows_pallas)
        return extract_demod_spec_rows_pallas(s, a0, c, m)

    variants = {
        "reorder": lambda s: reorder_only(s),
        "native": lambda s: jnp.fft.ifft(reorder_only(s) / s_fac),
        "fourstep": lambda s: _fft.ifft_decomposed(reorder_only(s) / s_fac),
        "pallas": _pallas_variant,
        "fused": _fused_variant,
        "fused_demod": _fused_demod_variant,
        "fused_spec": _fused_spec_variant,
        "full": lambda s: extract_full(s),
    }

    def fetch(x):
        return float(to_host(x))

    iters = args.iters
    keys = [jax.random.key(i) for i in range(iters + 1)]
    specs = [make_spec(k) for k in keys]
    jax.block_until_ready(specs)

    peak = 819e9  # v5e HBM
    for name, fn in variants.items():
      try:
        @jax.jit
        def timed(s, ch, _fn=fn):
            out = _fn(s * (1.0 + ch * 1e-3))
            sl = out.ravel()[::4096]
            return jnp.mean(jnp.abs(sl)) + jnp.real(out.ravel()[0]) * 1e-3

        chk = timed(specs[-1], jnp.float32(0))
        fetch(chk)  # compile + drain
        epoch_means = []
        for _ in range(args.epochs):
            fetch(chk)
            t0 = time.perf_counter()
            for i in range(iters):
                chk = timed(specs[i], chk)
            fetch(chk)
            epoch_means.append((time.perf_counter() - t0) / iters)
        # Floor: read the spectrum + write the (C, m) output, c64.
        floor = 2 * n * 8 / peak
        valid = [d for d in epoch_means if d >= floor] or epoch_means
        dt = min(valid)
        print(json.dumps({
            "variant": name, "ms": round(dt * 1e3, 2),
            "epoch_ms": [round(d * 1e3, 2) for d in epoch_means],
            "min_traffic_gb_per_s": round(2 * n * 8 / dt / 1e9, 1),
            "floor_ms": round(floor * 1e3, 3),
        }), flush=True)
      except Exception as e:  # one bad lowering must not kill the rest
        print(json.dumps({"variant": name,
                          "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
