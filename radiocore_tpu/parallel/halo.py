"""Halo exchange for time-sharded FIR filtering.

The sequence-parallel analog from SURVEY.md §2.5: the 1-second sample
axis is sharded across chips; a causal FIR needs the last ``num_taps−1``
samples of the left neighbor's block, a zero-phase FIR needs halos on
both sides. Exchanges ride ICI via ``lax.ppermute`` inside ``shard_map``
(the XLA-collective form of the Pallas ``make_async_remote_copy`` ring
pattern in SNIPPETS.md [2]).

These functions are written to run INSIDE ``shard_map`` (they use an
``axis_name``); :func:`fir_causal_sharded` / :func:`zero_phase_fir_sharded`
wrap them for whole-array callers.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radiocore_tpu.ops.fir import fir_causal, zero_phase_fir, _corr_valid


def _shift_right(block_tail: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Send each shard's tail to its right neighbor; shard 0 receives zeros."""
    n = lax.axis_size(axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    return lax.ppermute(block_tail, axis_name, perm)


def _shift_left(block_head: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Send each shard's head to its left neighbor; last shard receives zeros."""
    n = lax.axis_size(axis_name)
    perm = [(i + 1, i) for i in range(n - 1)]
    return lax.ppermute(block_head, axis_name, perm)


def halo_exchange(x: jnp.ndarray, n_left: int, n_right: int,
                  axis_name: str) -> jnp.ndarray:
    """Pad a time-sharded block with neighbor samples along the last axis.

    Returns ``(..., n_left + block + n_right)``; edge shards are padded
    with zeros where no neighbor exists (callers overlay stream state or
    edge extension for the global boundary).
    """
    parts = []
    if n_left > 0:
        parts.append(_shift_right(x[..., -n_left:], axis_name))
    parts.append(x)
    if n_right > 0:
        parts.append(_shift_left(x[..., :n_right], axis_name))
    return jnp.concatenate(parts, axis=-1)


def fir_causal_halo(x: jnp.ndarray, taps: np.ndarray,
                    axis_name: str) -> jnp.ndarray:
    """Causal FIR on a time-sharded block (runs inside shard_map).

    Bit-identical to the unsharded :func:`~radiocore_tpu.ops.fir.fir_causal`
    with zero initial history: every shard filters its block using the
    left neighbor's tail as history; shard 0 uses zeros.
    """
    t = len(taps)
    ext = halo_exchange(x, t - 1, 0, axis_name)
    kernel = jnp.asarray(np.asarray(taps)[::-1], dtype=x.dtype)
    return _corr_valid(ext, kernel)


def zero_phase_fir_halo(x: jnp.ndarray, taps: np.ndarray,
                        axis_name: str) -> jnp.ndarray:
    """Zero-phase FIR on a time-sharded block (runs inside shard_map).

    Interior is the exact forward-backward filter: two sweeps with halos
    on alternating sides. Global-edge transients (first/last
    ``3·num_taps`` samples of the whole signal) follow zero-padding
    rather than scipy's odd extension — a boundary-only difference.
    """
    t = len(taps)
    kernel = jnp.asarray(np.asarray(taps), dtype=x.dtype)
    # Forward pass (causal): left halo.
    ext = halo_exchange(x, t - 1, 0, axis_name)
    fwd = _corr_valid(ext, kernel[::-1])
    # Backward pass (anti-causal): right halo, correlate un-flipped.
    ext2 = halo_exchange(fwd, 0, t - 1, axis_name)
    return _corr_valid(ext2, kernel)


def fir_causal_sharded(x: jnp.ndarray, taps: np.ndarray, mesh: Mesh,
                       axis_name: str = "time") -> jnp.ndarray:
    """Whole-array wrapper: shard ``x``'s last axis over ``axis_name``."""
    ndim = x.ndim
    spec = P(*([None] * (ndim - 1) + [axis_name]))
    fn = jax.shard_map(
        functools.partial(fir_causal_halo, taps=taps, axis_name=axis_name),
        mesh=mesh, in_specs=spec, out_specs=spec)
    return fn(x)


def zero_phase_fir_sharded(x: jnp.ndarray, taps: np.ndarray, mesh: Mesh,
                           axis_name: str = "time") -> jnp.ndarray:
    """Whole-array wrapper for the zero-phase sharded filter."""
    ndim = x.ndim
    spec = P(*([None] * (ndim - 1) + [axis_name]))
    fn = jax.shard_map(
        functools.partial(zero_phase_fir_halo, taps=taps,
                          axis_name=axis_name),
        mesh=mesh, in_specs=spec, out_specs=spec)
    return fn(x)
