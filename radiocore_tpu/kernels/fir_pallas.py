"""Overlap-save causal FIR as banded-Toeplitz matmuls on the MXU.

Replaces the conv path of cuSignal ``lfilter``/``filtfilt``
(reference: ``radiocore/analog/deemphasis.py:64``,
``radiocore/analog/bandpass.py:72``) with a TPU-native formulation:

View the signal tiled as ``x2d (rows, 128)`` (sample ``n = 128·r + c``).
For tap count T, a causal FIR is

    y2d[r] = Σ_h x2d[r-h] · M_h,     H = ceil((T-1)/128) halo rows,

where ``M_h[i, c] = taps[c + 128·h − i]`` (zero outside ``[0, T)``) —
banded 128×128 Toeplitz matrices baked at trace time. Each output row is
H+1 small matmuls: ~2·(H+1)·128 FLOP/sample regardless of T (for the
common T ≤ 129, H = 1 → 512 FLOP/sample), which keeps the kernel
HBM-bandwidth-bound — the "speed of light" target of BASELINE.md.

Grid: (batch, row-blocks). Blocks overlap by H halo rows, so inputs stay
in ANY/HBM memory space and each program DMAs its ``(BR+H, 128)`` slice
into VMEM scratch explicitly.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiocore_tpu.runtime.platform import has_tpu

LANES = 128
DEF_BLOCK_ROWS = 256  # 32768 samples per program


def taps_to_band_matrices(taps: np.ndarray) -> np.ndarray:
    """Build the (H+1, 128, 128) banded matrices for ``taps`` (float64 in)."""
    taps = np.asarray(taps, dtype=np.float64)
    t = len(taps)
    h_max = -(-max(t - 1, 0) // LANES)  # ceil((T-1)/128)
    m = np.zeros((h_max + 1, LANES, LANES), dtype=np.float32)
    i = np.arange(LANES)[:, None]
    c = np.arange(LANES)[None, :]
    for h in range(h_max + 1):
        k = c + LANES * h - i
        valid = (k >= 0) & (k < t)
        m[h][valid] = taps[k[valid]].astype(np.float32)
    return m


def _fir_kernel(x_hbm, m_ref, o_ref, x_vmem, sem, *, block_rows, n_halo,
                halo_pad):
    b = pl.program_id(0)
    i = pl.program_id(1)
    # DMA the overlapping (block_rows + halo_pad, 128) slice into VMEM.
    # halo_pad is n_halo rounded up to the sublane tile (8 rows) so the
    # DMA shape stays tile-aligned.
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * block_rows, block_rows + halo_pad), :],
        x_vmem, sem)
    copy.start()
    copy.wait()
    acc = jnp.zeros((block_rows, LANES), dtype=jnp.float32)
    for h in range(n_halo + 1):
        rows = x_vmem[pl.ds(halo_pad - h, block_rows), :]
        acc = acc + jnp.dot(rows, m_ref[h], preferred_element_type=jnp.float32)
    o_ref[0, :, :] = acc


@functools.lru_cache(maxsize=8)
def _batched_call(block_rows: int):
    """pallas_call wrapper with a custom vmap rule.

    The ANY-memory-space input only lowers with whole-array blocks, so an
    outer ``vmap`` (e.g. a vmapped WBFM step) cannot add a batched block
    dim; instead the rule collapses the vmap axis into the kernel's own
    leading batch grid dimension.
    """

    @jax.custom_batching.custom_vmap
    def call(x_ext, mats):
        return _fir_blocks(x_ext, mats, block_rows)

    @call.def_vmap
    def _rule(axis_size, in_batched, x_ext, mats):  # noqa: ANN001
        x_b, m_b = in_batched
        if m_b:
            raise NotImplementedError("taps cannot be batched under vmap")
        if not x_b:
            return call(x_ext, mats), False
        v, b, rows, lanes = x_ext.shape
        y = call(x_ext.reshape(v * b, rows, lanes), mats)
        return y.reshape(v, b, *y.shape[1:]), True

    return call


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("block_rows",))
def _fir_blocks(x_ext: jnp.ndarray, mats: jnp.ndarray,
                block_rows: int) -> jnp.ndarray:
    """x_ext: (batch, rows + halo_pad, 128) with halo/history rows on top."""
    batch, ext_rows, _ = x_ext.shape
    n_halo = mats.shape[0] - 1
    halo_pad = _round_up(max(n_halo, 1), 8)  # sublane-aligned DMA shapes
    rows = ext_rows - halo_pad
    n_blocks = rows // block_rows
    grid = (batch, n_blocks)
    return pl.pallas_call(
        functools.partial(_fir_kernel, block_rows=block_rows, n_halo=n_halo,
                          halo_pad=halo_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # whole x_ext in HBM
            pl.BlockSpec((mats.shape[0], LANES, LANES),
                         lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # band matrices resident
        ],
        out_specs=pl.BlockSpec((1, block_rows, LANES),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, rows, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_rows + halo_pad, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=not has_tpu(),
    )(x_ext, mats)


def fir_causal_pallas(x: jnp.ndarray, taps,
                      history: Optional[jnp.ndarray] = None,
                      block_rows: int = DEF_BLOCK_ROWS) -> jnp.ndarray:
    """Causal FIR along the last axis (Pallas MXU kernel).

    Drop-in for :func:`radiocore_tpu.ops.fir.fir_causal` on float32
    signals: ``y[n] = Σ_k taps[k]·x[n−k]`` with ``history`` as the
    pre-``x`` samples (zeros by default). Arbitrary leading batch dims.
    """
    mats = jnp.asarray(taps_to_band_matrices(np.asarray(taps)))
    n_halo = int(mats.shape[0]) - 1
    halo_pad = _round_up(max(n_halo, 1), 8)
    t_hist = halo_pad * LANES

    lead = x.shape[:-1]
    n = x.shape[-1]
    x2 = x.reshape((-1, n)).astype(jnp.float32)
    batch = x2.shape[0]

    # History occupies the tail of the (tile-aligned) halo rows.
    halo = jnp.zeros((batch, t_hist), jnp.float32)
    if history is not None:
        h = history.reshape((batch, -1)).astype(jnp.float32)
        halo = halo.at[:, t_hist - h.shape[-1]:].set(h)

    # Pad the signal tail to a whole number of blocks of rows.
    samples_per_block = block_rows * LANES
    n_pad = (-n) % samples_per_block
    x2 = jnp.concatenate(
        [halo, x2, jnp.zeros((batch, n_pad), jnp.float32)], axis=-1)
    x_ext = x2.reshape(batch, -1, LANES)

    y = _batched_call(block_rows)(x_ext, mats)
    return y.reshape(batch, -1)[:, :n].reshape(lead + (n,))
