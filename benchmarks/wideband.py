"""Wideband channelizer benchmark — BASELINE.md config 4.

61.44 MS/s complex band → 64 channels of 960 kS/s via the polyphase
filterbank, plus an overlap-save FIR pass at the full band rate.
Reports Msamples/s on the active platform (optionally sharded over the
``time`` axis of a mesh with ``--time-shards``; FIR halos ride
ppermute — parallel/halo.py).

    python benchmarks/wideband.py [--seconds 0.5] [--time-shards N]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--band-rate", type=float, default=61.44e6)
    parser.add_argument("--channels", type=int, default=64)
    parser.add_argument("--taps-per-branch", type=int, default=8)
    parser.add_argument("--fir-taps", type=int, default=129)
    parser.add_argument("--seconds", type=float, default=0.25)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--time-shards", type=int, default=0,
                        help=">0: shard the band over a time mesh axis")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from scipy import signal as sig
    from radiocore_tpu.ops.pfb import pfb_taps, pfb_init, pfb_channelize
    from radiocore_tpu.ops.fir import fir_overlap_save

    m = args.channels
    n = int(args.band_rate * args.seconds)
    n -= n % m
    taps = pfb_taps(m, args.taps_per_branch)
    fir = sig.firwin(args.fir_taps, 0.45)

    @jax.jit
    def make_band(key):
        planes = 0.1 * jax.random.normal(key, (2, n), jnp.float32)
        return jax.lax.complex(planes[0], planes[1])

    hist = pfb_init(m, args.taps_per_branch)

    if args.time_shards > 0:
        # Sequence-parallel form: per-shard FFTs + halo ppermute only —
        # no full-band gather (parallel/halo.py).
        from jax.sharding import PartitionSpec as P
        from radiocore_tpu.parallel.mesh import make_radio_mesh, TIME
        from radiocore_tpu.parallel.halo import (fir_overlap_save_halo,
                                                 pfb_channelize_halo)
        mesh = make_radio_mesh(stations=1, time=args.time_shards,
                               devices=jax.devices()[:args.time_shards])

        def local(band, h):
            band, _ = fir_overlap_save_halo(band, fir, TIME)
            return pfb_channelize_halo(band, taps, m, TIME,
                                       stream_history=h)

        step = jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(P(TIME), P()),
            out_specs=(P(TIME, None), P())))
    else:
        @jax.jit
        def step(band, h):
            band = fir_overlap_save(band, fir)
            return pfb_channelize(band, taps, m, history=h)

    band = make_band(jax.random.key(0))
    jax.block_until_ready(band)

    ch, hist2 = step(band, hist)
    jax.block_until_ready(ch)

    t0 = time.perf_counter()
    h = hist
    for _ in range(args.iters):
        ch, h = step(band, h)
    jax.block_until_ready(ch)
    dt = (time.perf_counter() - t0) / args.iters

    msps = n / dt / 1e6

    # HBM speed-of-light fraction (BASELINE.md: "FIR + FFT kernel
    # throughput ~HBM-bandwidth"). Minimum HBM traffic for the fused
    # step, assuming perfect on-chip reuse of taps/twiddles:
    #   overlap-save FIR: read band + write band           (2 c64 / sample)
    #   PFB polyphase conv + M-FFT: read band + write chans (2 c64 / sample)
    # c64 = 8 bytes. XLA's actual traffic is higher (FFT stages
    # materialize intermediates), so this is a conservative lower bound —
    # the fraction understates true HBM utilization.
    hbm_peak = {"TPU v5 lite": 819e9}  # v5e: 819 GB/s per chip
    dev = jax.devices()[0].device_kind
    peak = next((v for k, v in hbm_peak.items() if k in dev), None)
    if peak and args.time_shards > 1:
        peak *= args.time_shards  # aggregate over participating chips
    min_bytes = 4 * n * 8
    result = {
        "metric": "wideband_fir_pfb_msamples_per_s",
        "value": round(msps, 1),
        "unit": "Msps",
        "band_rate_msps": args.band_rate / 1e6,
        "realtime_factor": round(msps * 1e6 / args.band_rate, 2),
        "channels": m,
        "min_hbm_gbytes_per_s": round(min_bytes / dt / 1e9, 1),
    }
    if peak:
        result["hbm_speed_of_light_fraction"] = round(
            min_bytes / dt / peak, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
