"""Wideband channelizer benchmark — BASELINE.md config 4, bench.py protocol.

61.44 MS/s complex band → 64 channels: overlap-save FIR at the full band
rate + a channelizer (``--channelizer fft``: band FFT → static slices →
batched IFFT, the bench.py pipeline's form; ``--channelizer pfb``:
critically-sampled polyphase filterbank).

This harness exists because four rounds of ``benchmarks/wideband.py``
attempts died at their first scalar D2H (UNIMPLEMENTED) while bench.py
fetched fine in the same queue epochs (VERDICT r4 #1;
bench_logs/tpu_queue_r4.log:336-638). The protocol difference is the
suspect, so this file replicates bench.py's EXACT measurement shape:

  * per-call jit steps (NOT a device fori_loop — wideband.py's r4 form),
  * the step RETURNS its large output (the channel matrix) plus a
    derived scalar; the scalar chains into the next call's input
    (dedup/elision-proof) and the streaming history pytree threads
    through every call,
  * fresh pre-generated random band per call,
  * async epochs with one trailing resilient ``to_host`` scalar fetch
    as the hard barrier (``fetch`` before the clock starts too),
  * min-of-epochs headline + HBM roofline guard.

Bisect knobs (if the full program still wedges its process's D2H, one
queue wave isolates the poison element):
  ``--fir none``    drop the band-rate FIR (program ≈ bench.py's head),
  ``--fir conv``    XLA conv instead of the Pallas MXU kernel,
  ``--fir pallas``  the default (kernels/fir_pallas.py).

Reference workload anchor: the full-band FFT the reference channelizer
scales up, ``/root/reference/radiocore/tools/tuner.py:137-138``, at
BASELINE.json config 4 (61.44 MS/s → 64 channels, overlap-save FIR).

    python benchmarks/wideband_bench.py [--channelizer fft|pfb]
        [--fir pallas|conv|none] [--seconds 0.25]

Prints ONE JSON line to stdout; diagnostics to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def plan_n(band_rate: float, seconds: float, channels: int,
           channelizer: str) -> int:
    """Chunk length: pow2-snapped for the fft form (native band FFT)."""
    n = int(band_rate * seconds)
    if channelizer == "fft":
        p = 1
        while p * 2 <= n:
            p *= 2
        n = p
    return n - n % channels


def build_step(channelizer: str, fir_impl: str, n: int, m: int,
               taps_per_branch: int = 8, fir_taps: int = 129,
               stage: str = "full"):
    """(step, initial history) — step(band, h) → (channels, h).

    ``stage`` bisects the fft-channelizer program: 'fft' stops after the
    band FFT, 'extract'/'full' adds the channel extraction (no output
    transpose — the layout is benchmark-irrelevant and a big transposed
    ravel is one more D2H-wedge suspect).

    Shared with benchmarks/smoke_compile.py so the queue-head smoke
    stage AOT-warms the exact programs this benchmark runs.
    """
    import jax
    import jax.numpy as jnp
    from scipy import signal as sig
    from radiocore_tpu.ops.pfb import pfb_taps, pfb_init, pfb_channelize
    from radiocore_tpu.ops.fir import fir_causal

    taps = pfb_taps(m, taps_per_branch)
    fir = sig.firwin(fir_taps, 0.45).astype(np.float32)
    hist = pfb_init(m, taps_per_branch)

    def band_fir(band):
        if fir_impl == "none":
            return band
        planes = jnp.stack([jnp.real(band), jnp.imag(band)])
        f = fir_causal(planes, fir, impl=fir_impl)
        return jax.lax.complex(f[0], f[1])

    if channelizer == "pfb":
        def step(band, h):
            return pfb_channelize(band_fir(band), taps, m, history=h)
        return step, hist

    from radiocore_tpu.ops import fft as _fft
    from radiocore_tpu.ops.channelize import make_extractor
    chunk = n // m
    grid = [((k * chunk + n // 2) % n) - n // 2 for k in range(m)]
    extract = make_extractor(n, tuple(-g for g in grid), chunk)

    # STATELESS (no history in the signature at all): the fft form
    # never used it, and the wave-1.5 elimination left the carried
    # history arg as the one element separating every wedging config-4
    # program from bench.py's proven-fetchable stage programs.
    if stage == "fft":
        def step(band):
            return _fft.fft(band_fir(band))          # spectrum only
    else:
        def step(band):
            return extract(_fft.fft(band_fir(band)))  # (m, chunk)

    return step, None


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--band-rate", type=float, default=61.44e6)
    parser.add_argument("--channels", type=int, default=64)
    parser.add_argument("--taps-per-branch", type=int, default=8)
    parser.add_argument("--fir-taps", type=int, default=129)
    parser.add_argument("--seconds", type=float, default=0.25)
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--channelizer", default="fft",
                        choices=("fft", "pfb"))
    parser.add_argument("--fir", default="pallas",
                        choices=("pallas", "conv", "fft", "none"),
                        help="band-rate FIR lowering (bisect knob)")
    parser.add_argument("--stage", default="full",
                        choices=("full", "fft"),
                        help="program bisect: 'fft' = band FFT only")
    parser.add_argument("--touch-history", action="store_true",
                        help="force a real computation into the "
                             "history output (alias-elision control)")
    parser.add_argument("--fetch-via", default="direct",
                        choices=("direct", "demod"),
                        help="'demod': launder every scalar fetch "
                             "through a known-fetchable WBFM program "
                             "whose input depends on the chained value "
                             "(the wave-1/1.5 finding: D2H of anything "
                             "THIS program produces is refused while "
                             "bench.py-program buffers fetch fine in "
                             "the same session; the dependency still "
                             "forces the whole chain to execute)")
    args = parser.parse_args(argv)

    import jax
    from radiocore_tpu.runtime.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    m = args.channels
    n = plan_n(args.band_rate, args.seconds, m, args.channelizer)
    step, hist = build_step(args.channelizer, args.fir, n, m,
                            args.taps_per_branch, args.fir_taps,
                            stage=args.stage)

    @jax.jit
    def make_band(key):
        planes = 0.1 * jax.random.normal(key, (2, n), jnp.float32)
        return jax.lax.complex(planes[0], planes[1])

    # bench.py shape: the step is a per-call jit that RETURNS the large
    # channel matrix; the chained scalar derives from it (strided
    # samples + one element — the relay can neither dedupe nor elide).
    stateless = hist is None

    @jax.jit
    def step_chained_stateless(band, c):
        ch = step(band * (1.0 + c * 1e-3))
        chk = jnp.mean(jnp.abs(ch.ravel()[::4096])) \
            + jnp.real(ch.ravel()[0]) * 1e-3
        return ch, chk

    @jax.jit
    def step_chained(band, h, c):
        ch, h2 = step(band * (1.0 + c * 1e-3), h)
        if args.touch_history:
            # Control: the fft-mode step passes `h` through UNTOUCHED
            # (and the pfb/fir histories are input SLICES), so XLA can
            # alias the output to an input buffer — a program shape
            # bench.py (whose state is a genuinely computed array)
            # never produces, and the one element present in every
            # wedging config-4 variant. Force a real, non-foldable
            # computation into the history output (c is runtime data;
            # `a*(1+c*0)` would fold back to the identity).
            h2 = jax.tree_util.tree_map(
                lambda a: a + (c * 1e-30).astype(a.dtype), h2)
        chk = jnp.mean(jnp.abs(ch.ravel()[::4096])) \
            + jnp.real(ch.ravel()[0]) * 1e-3
        return ch, h2, chk

    iters, epochs = args.iters, args.epochs
    keys = [jax.random.key(i) for i in range(iters + 1)]
    t0 = time.perf_counter()
    bands = [make_band(k) for k in keys]
    jax.block_until_ready(bands)
    log(f"bands: {iters + 1} × {n * 8 / 1e6:.0f} MB "
        f"in {time.perf_counter() - t0:.2f} s")

    t0 = time.perf_counter()
    if stateless:
        hist_d = None
        ch, chk = step_chained_stateless(bands[-1], jnp.float32(0))
    else:
        ch, hist_d, chk = step_chained(bands[-1], hist, jnp.float32(0))
    jax.block_until_ready(chk)
    log(f"compile+first-step: {time.perf_counter() - t0:.2f} s")

    from radiocore_tpu.runtime.transfer import to_host

    if args.fetch_via == "demod":
        from radiocore_tpu.models.wbfm import (make_wbfm_step,
                                               wbfm_init_state)
        _wstep = make_wbfm_step(262_144, 49_152, mode="fast")
        _wst = wbfm_init_state(49_152)

        @jax.jit
        def _laundered(key, c, st):
            # `st` is an ARGUMENT: a closed-over device array would be
            # constant-folded into the HLO via a lowering-time D2H
            # fetch — which is exactly what this path must avoid
            # (CLAUDE.md; wave-1.6 attempt 1 died there).
            p = 0.1 * jax.random.normal(key, (2, 262_144), jnp.float32)
            iq = jax.lax.complex(p[0], p[1]) * (1.0 + c * 1e-3)
            a, _ = _wstep(iq, st)
            return jnp.mean(jnp.abs(a))

        _fetch_n = [0]

        def fetch(c):
            # Serial dependency: the WBFM probe's input folds in `c`,
            # so the relay must complete the wideband chain to produce
            # this (fetchable) value. Fresh key per call (dedup-proof).
            _fetch_n[0] += 1
            return float(to_host(_laundered(jax.random.key(
                90_000 + _fetch_n[0]), c, _wst)))
    else:
        def fetch(c):
            return float(to_host(c))

    def run_epoch(h, chk):
        fetch(chk)                      # hard drain before the clock
        t0 = time.perf_counter()
        for i in range(iters):
            if stateless:
                ch, chk = step_chained_stateless(bands[i], chk)
            else:
                ch, h, chk = step_chained(bands[i], h, chk)
        chk_val = fetch(chk)            # hard barrier inside the window
        return (time.perf_counter() - t0) / iters, h, chk, chk_val

    epoch_means = []
    for e in range(epochs):
        dt_e, hist_d, chk, chk_val = run_epoch(hist_d, chk)
        epoch_means.append(dt_e)
        log(f"epoch {e}: {dt_e * 1e3:.2f} ms/step  (chk={chk_val:.4e})")

    # ---- HBM roofline guard (bench.py form) ---------------------------
    # Minimum traffic for the fused step: FIR read band + write band,
    # channelizer read band + write channels ⇒ 4 c64 passes of n.
    hbm_peak = {"TPU v5 lite": 819e9, "TPU v5e": 819e9}
    dev = jax.devices()[0].device_kind
    peak = next((v for k, v in hbm_peak.items() if k in dev), None)
    min_bytes = (4 if args.fir != "none" else 2) * n * 8
    suspect = False
    dt = min(epoch_means)
    if peak:
        floor = min_bytes / peak
        log(f"roofline floor ({dev}): {floor * 1e3:.3f} ms")
        valid = [d for d in epoch_means if d >= floor]
        if valid:
            dt = min(valid)
        else:
            log("ALL epochs beat the roofline — reporting slowest, suspect")
            dt = max(epoch_means)
            suspect = True

    msps = n / dt / 1e6
    result = {
        "metric": "wideband_fir_channelizer_msamples_per_s",
        "value": round(msps, 1),
        "unit": "Msps",
        "band_rate_msps": args.band_rate / 1e6,
        "realtime_factor": round(msps * 1e6 / args.band_rate, 2),
        "n": n,
        "channels": m,
        "channelizer": args.channelizer,
        "fir": args.fir,
        "stage": args.stage,
        "ms_per_step": round(dt * 1e3, 3),
        "epoch_ms": [round(d * 1e3, 2) for d in epoch_means],
        "min_hbm_gbytes_per_s": round(min_bytes / dt / 1e9, 1),
        "fetch_via": args.fetch_via,
        "protocol": "bench.py form: per-call jit, fresh bands, "
                    "chained channel-derived scalar + history, "
                    "min-of-epochs, roofline guard",
    }
    if peak:
        result["hbm_speed_of_light_fraction"] = round(
            min_bytes / dt / peak, 3)
    if suspect:
        result["suspect"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    main()
