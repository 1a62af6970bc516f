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

import functools
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radiocore_tpu.models.wbfm import make_wbfm_step, wbfm_init_state
from radiocore_tpu.ops import design
from radiocore_tpu.ops import fft as _fft
from radiocore_tpu.parallel.mesh import STATIONS, TIME


def _channelizer_constants(n_band: int, offsets_hz: Sequence[int],
                           station_chunk: int):
    """Precompute the all-stations spectrum-gather (see tools/tuner.py)."""
    m = int(station_chunk)
    m2 = m // 2 + 1
    win = np.fft.fftshift(design.window("hann", n_band))
    k = np.concatenate([np.arange(m2), np.arange(n_band - (m - m2), n_band)])
    shifts = -np.asarray(offsets_hz, dtype=np.int64)  # roll = f_center − f_ch
    src = (k[None, :] - shifts[:, None]) % n_band
    w = win[k].astype(np.float32)
    fix = None
    if m % 2 == 0:
        k_fix = n_band - m // 2
        fix = (((k_fix - shifts) % n_band).astype(np.int64),
               np.float32(win[k_fix]))
    return src.astype(np.int64), w, fix, m2


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
    src, w, fix, m2 = _channelizer_constants(n_band, offsets_hz, station_chunk)
    s_fac = n_band / station_chunk
    wbfm = make_wbfm_step(station_chunk, audio_chunk, deemphasis, mode=mode)
    wbfm_batched = jax.vmap(wbfm)

    src_j = jnp.asarray(src)
    w_j = jnp.asarray(w)

    def step(band_iq: jnp.ndarray, state: dict):
        spectrum = _fft.fft(band_iq)
        y = spectrum[src_j] * w_j
        if fix is not None:
            fix_idx, fix_w = fix
            y = y.at[:, m2 - 1].add(spectrum[jnp.asarray(fix_idx)] * fix_w)
        stations_iq = _fft.ifft(y / s_fac)
        return wbfm_batched(stations_iq.astype(jnp.complex64), state)

    state0 = wbfm_init_state(audio_chunk, deemphasis,
                             batch_shape=(n_stations,))

    if mesh is not None:
        st = NamedSharding(mesh, P(STATIONS))
        st3 = NamedSharding(mesh, P(STATIONS, None, None))
        tm = NamedSharding(mesh, P(TIME))
        state_sh = {"deemph_l": NamedSharding(mesh, P(STATIONS, None)),
                    "deemph_r": NamedSharding(mesh, P(STATIONS, None))}
        step = jax.jit(step,
                       in_shardings=(tm, state_sh),
                       out_shardings=(st3, state_sh))
        state0 = jax.device_put(state0, state_sh)
    else:
        step = jax.jit(step)

    return step, state0
