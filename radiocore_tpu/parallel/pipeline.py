"""Fused multi-station pipeline: channelize + batched demod in one program.

The reference processes stations sequentially — full-band FFT, then a
per-channel Python loop of roll/resample/demod
(reference: ``examples/multi_fm_server.py:100-106``). Here the whole
second of work is ONE jitted function:

    band IQ (n_band,) ──FFT──► spectrum ──gather──► (n_stations, station_chunk)
        ──vmap(wbfm_step)──► audio (n_stations, audio_chunk, 2)

and scaling is sharding annotations on that function: the station axis
shards like a batch axis (zero steady-state collectives), the band FFT is
partitioned by XLA's SPMD pass when its input is time-sharded.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radiocore_tpu.models.wbfm import make_wbfm_step, wbfm_init_state
from radiocore_tpu.ops import fft as _fft
from radiocore_tpu.ops.channelize import make_extractor
from radiocore_tpu.parallel.mesh import STATIONS, TIME


def _make_distributed_fused(mesh: Mesh, n_band: int,
                            offsets_hz: Sequence[int], station_chunk: int):
    """Distributed band FFT + channel extraction as one shard_map.

    Returns a jitted ``band (n,) → stations (C, m)`` function sharded in
    contiguous blocks over ALL mesh devices, or None when the plan
    doesn't qualify. The per-shard body (six-step FFT + roll + windowed
    extraction) lives in :mod:`radiocore_tpu.parallel.channelize_sharded`
    — shared with the wideband config-4 benchmark.
    """
    from radiocore_tpu.parallel.channelize_sharded import make_extract_body

    d = int(mesh.devices.size)
    axis = "fftax"
    body = make_extract_body(n_band, tuple(int(-o) for o in offsets_hz),
                             station_chunk, d, axis)
    if body is None:
        return None
    # Flat 1-axis view of the same devices in row-major mesh order: the
    # resulting block sharding is identical (same HloSharding) to
    # ``P((STATIONS, TIME))`` on the caller's 2-D mesh, so downstream
    # jits with 2-D-mesh shardings accept the outputs without resharding.
    flat_mesh = Mesh(mesh.devices.reshape(-1), (axis,))
    return jax.jit(jax.shard_map(body, mesh=flat_mesh,
                                 in_specs=P(axis), out_specs=P(axis, None)))


def make_multi_station_step(
        n_band: int,
        offsets_hz: Sequence[int],
        station_chunk: int,
        audio_chunk: int,
        deemphasis: float = 75e-6,
        mesh: Optional[Mesh] = None,
        mode: str = "exact",
) -> Tuple[Callable, dict]:
    """Build ``step(band_iq, state) -> (audio, state)`` plus initial state.

    * ``n_band``: full-band chunk length (== band sample rate, one-second
      convention).
    * ``offsets_hz``: per-station center-frequency offsets from the band
      center, in Hz (== bins).
    * ``station_chunk``: per-station IQ chunk (== station bandwidth).
    * ``audio_chunk``: audio samples out per station per chunk.

    When ``mesh`` is given the returned step is jitted with shardings:
    audio/state sharded over the ``stations`` axis, band input sharded
    over ``time``. XLA's SPMD partitioner inserts the collectives (the
    band FFT and the station gather are the only cross-shard points).
    """
    n_stations = len(offsets_hz)
    # Roll = band_center − station_center = −offset (tuner convention).
    extract = make_extractor(int(n_band),
                             tuple(int(-o) for o in offsets_hz),
                             int(station_chunk))
    wbfm = make_wbfm_step(station_chunk, audio_chunk, deemphasis, mode=mode)
    wbfm_batched = jax.vmap(wbfm)

    def band_fft(band_iq: jnp.ndarray) -> jnp.ndarray:
        if mesh is not None:
            # Gather the time-sharded band before the FFT with an explicit
            # canonical-layout constraint (the CPU FFT runtime rejects the
            # partitioner's implicit-gather layout; on TPU this is where a
            # sharded four-step FFT slots in — parallel/fft_sharded.py).
            band_iq = jax.lax.with_sharding_constraint(
                band_iq, NamedSharding(mesh, P()))
        return _fft.fft(band_iq)

    def wbfm_stage(stations_iq: jnp.ndarray, state: dict):
        return wbfm_batched(stations_iq.astype(jnp.complex64), state)

    state0 = wbfm_init_state(audio_chunk, deemphasis,
                             batch_shape=(n_stations,))

    if mesh is not None:
        dist = _make_distributed_fused(
            mesh, n_band, offsets_hz, station_chunk)
        if dist is not None:
            # Fully distributed front-end: six-step band FFT + local
            # channel extraction in ONE shard_map over all devices — no
            # device ever holds the full band spectrum (per-device peak
            # is ~1/D of the band), and the demod shards stations over
            # every device too.
            all_ax = NamedSharding(mesh, P((STATIONS, TIME), None))
            all_ax3 = NamedSharding(mesh, P((STATIONS, TIME), None, None))
            state_sh = {"deemph_l": all_ax, "deemph_r": all_ax}
            wbfm_j = jax.jit(wbfm_stage,
                             out_shardings=(all_ax3, state_sh))
            state0 = jax.device_put(state0, state_sh)

            def step(band_iq: jnp.ndarray, state: dict):
                return wbfm_j(dist(band_iq), state)

            return step, state0

        # Fallback (non-uniform channel plan or indivisible sizes):
        # gather the time-sharded band to replicated before the FFT.
        st2 = NamedSharding(mesh, P(STATIONS, None))
        st3 = NamedSharding(mesh, P(STATIONS, None, None))
        tm = NamedSharding(mesh, P(TIME))
        state_sh = {"deemph_l": st2, "deemph_r": st2}
        band_fft = jax.jit(band_fft, in_shardings=tm)
        extract_j = jax.jit(extract, out_shardings=st2)
        wbfm_j = jax.jit(wbfm_stage, out_shardings=(st3, state_sh))
        state0 = jax.device_put(state0, state_sh)

        def step(band_iq: jnp.ndarray, state: dict):
            return wbfm_j(extract_j(band_fft(band_iq)), state)

        return step, state0

    # Single-chip: ONE program when every FFT size lowers natively
    # (saves the inter-stage HBM round-trips of the spectrum/station
    # arrays — measured 26.9 → 25.4 ms at 64×262 144 on v5e). With a
    # planner-DECOMPOSED size in the program, keep per-stage jits: the
    # decomposition's transposes propagate tiled layouts that degrade
    # the extraction slices into gather-like loops (~129 ms vs ~19 ms
    # at 16×250 kS/s). A jit boundary pins canonical layouts.
    # The fused program contains FFTs at the band, station AND audio
    # sizes (the demod's irfft at audio_chunk; in exact mode also the
    # decimation irfft). A planner-decomposed size anywhere in a fused
    # program re-triggers the tiled-layout slowdown (~129 vs 19 ms
    # class) — EXCEPT pure power-of-two decompositions, whose pow2
    # sub-FFT reshapes keep canonical layouts (the hazard came from
    # odd-factor splits of sizes like 250 000). Pow2 four-step band
    # FFTs (the planner's preference above RADIOCORE_TPU_FFT_FOURSTEP
    # _MIN) therefore stay inside the single fused program.
    def _fusable(s: int) -> bool:
        return (s & (s - 1)) == 0 or _fft._plan(s) is None

    # Fused extract+demod kernel path (opt-in while hardware-validating):
    # band spectrum → quad (C, m) f32 in ONE Pallas pass — the station
    # IQ never touches HBM — then one batched rfft + the fast-mode
    # narrowband tail (kernels/extract_demod_pallas.py).
    import os
    _xd = os.environ.get("RADIOCORE_TPU_EXTRACT_DEMOD")
    if _xd in ("fused", "spec") and mode == "fast" and mesh is None:
        from radiocore_tpu.kernels.extract_demod_pallas import (
            extract_demod_ok, extract_demod_rows_pallas,
            extract_demod_spec_ok, extract_demod_spec_rows_pallas)
        from radiocore_tpu.ops.channelize import uniform_extraction_start
        shifts = tuple(int(-o) for o in offsets_hz)
        a0 = uniform_extraction_start(int(n_band), shifts,
                                      int(station_chunk))
        sc = int(station_chunk)
        ok = (a0 is not None and sc % 2 == 0
              and (extract_demod_spec_ok(int(n_band), sc, n_stations)
                   if _xd == "spec"
                   else extract_demod_ok(int(n_band), sc, n_stations)))
        if ok:
            tail_fn = make_wbfm_step(station_chunk, audio_chunk,
                                     deemphasis, mode="fast_spec")
            tail = jax.vmap(tail_fn)
            m2 = sc // 2 + 1
            nb = int(getattr(tail_fn, "needed_bins", m2))

            if _xd == "spec":
                # Spectrum-output mega-kernel: band spectrum →
                # composite spectra directly; neither the station IQ
                # nor the quad time series ever exists in HBM, and only
                # the bins the tail reads are written.
                @jax.jit
                def step(band_iq: jnp.ndarray, state: dict):
                    qs = extract_demod_spec_rows_pallas(
                        band_fft(band_iq), a0, n_stations, sc,
                        keep_bins=nb)
                    return tail(qs[:, :nb], state)
            else:
                @jax.jit
                def step(band_iq: jnp.ndarray, state: dict):
                    quad = extract_demod_rows_pallas(
                        band_fft(band_iq), a0, n_stations, sc)
                    return tail(_fft.rfft(quad), state)

            return step, state0

    if all(_fusable(s) for s in {int(n_band), int(station_chunk),
                                 int(audio_chunk)}):
        if mode == "fast":
            # Restructured fast path: the per-station composite rfft —
            # the demod stage's one full-length transform — is hoisted
            # OUT of the vmapped step into an explicit (C, m) batched
            # call. Mathematically identical (vmap of rfft is the same
            # batched HLO); the point is op-level routing: the Pallas
            # whole-row kernel must see the station batch directly
            # (vmapping a pallas_call adds a grid dim with pathological
            # lowering — the r4 all-pallas 10× slowdown,
            # BENCH_allpallas2_r04.json). Routing knob:
            # RADIOCORE_TPU_STATION_RFFT=pallas|native|auto. DEFAULT
            # since r5: auto = pallas on TPU — hardware A/B
            # BENCH_prfft_r05.json: 19.24 vs 20.35 ms/step, and the
            # standalone ladder has the kernel rfft at 6.15 vs 8.34 ms
            # native (DEMOD_PROFILE_r05.json).
            from radiocore_tpu.ops.demod import quadrature_demod
            tail_fn = make_wbfm_step(station_chunk, audio_chunk,
                                     deemphasis, mode="fast_spec")
            # No vmap: the fast_spec tail is batch-generic (last-axis
            # jnp ops), and an explicit (C, ...) batch is what lets any
            # Pallas routing inside it see the station batch directly
            # (vmap-of-pallas is the r4 10× pathology).
            tail = tail_fn
            sc = int(station_chunk)

            _rfft_impl = os.environ.get("RADIOCORE_TPU_STATION_RFFT",
                                        "auto")

            def station_rfft(quad: jnp.ndarray) -> jnp.ndarray:
                impl = _rfft_impl
                if impl == "auto":
                    from radiocore_tpu.runtime.platform import has_tpu
                    impl = "pallas" if has_tpu() else "native"
                if impl == "pallas":
                    from radiocore_tpu.kernels.fft_pallas import (
                        MAX_ROW, MIN_ROW, rfft_pow2_pallas)
                    h = sc // 2
                    if (sc & (sc - 1)) == 0 and MIN_ROW <= h <= MAX_ROW:
                        return rfft_pow2_pallas(quad)
                return _fft.rfft(quad)

            @jax.jit
            def step(band_iq: jnp.ndarray, state: dict):
                st_iq = extract(band_fft(band_iq)).astype(jnp.complex64)
                q_spec = station_rfft(quadrature_demod(st_iq))
                return tail(q_spec, state)

            return step, state0

        @jax.jit
        def step(band_iq: jnp.ndarray, state: dict):
            return wbfm_stage(extract(band_fft(band_iq)), state)

        return step, state0

    band_fft = jax.jit(band_fft)
    extract_j = jax.jit(extract)
    wbfm_j = jax.jit(wbfm_stage)

    def step(band_iq: jnp.ndarray, state: dict):
        return wbfm_j(extract_j(band_fft(band_iq)), state)

    return step, state0
