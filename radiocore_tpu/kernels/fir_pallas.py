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

Pipelining: the round-1 version DMA'd each overlapping block serially
(``copy.start(); copy.wait()`` back-to-back — zero overlap; measured
3.5× SLOWER than XLA conv). This version lets Mosaic's automatic
pipeliner double-buffer everything: the body block and a small
per-block halo array are ordinary VMEM BlockSpecs whose HBM→VMEM copies
for grid step i+1 overlap step i's matmuls. The halo rows are
materialized once by XLA as a ``(batch, n_blocks, halo_pad, 128)``
side array (+3% HBM traffic at the default block size).
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
SUBLANES = 8           # f32 min tile is (8, 128)
DEF_BLOCK_ROWS = 512   # 65536 samples per program

# MXU pass count for the banded matmuls (see _fir_kernel comment).
# "3pass" = hand-rolled bf16x3 (Mosaic rejects lax.Precision.HIGH —
# "Unsupported dot precision", r5 smoke — so the hi/lo decomposition is
# written out with DEFAULT bf16 dots; drops only the lo·lo term).
import os as _os  # noqa: E402

_FIR_PRECISION = jax.lax.Precision.HIGHEST


def _fir_mode() -> str:
    raw = _os.environ.get("RADIOCORE_TPU_FIR_PRECISION")
    if raw:
        return raw.lower()
    # TPU default since r5: 3pass — soaked (PALLAS_SOAK_3pass_r05.json:
    # marginal 0.499 vs 0.582 ms, 269 GB/s; rel err < 1e-4). CPU
    # (interpret-mode tests with tight parity bounds) stays HIGHEST.
    return "3pass" if has_tpu() else "highest"


def _dot_fir(x, m):
    if _fir_mode() == "3pass":
        def dot(a, b):
            return jnp.dot(a.astype(jnp.bfloat16),
                           b.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        x_hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        m_hi = m.astype(jnp.bfloat16).astype(jnp.float32)
        return dot(x_hi, m_hi) + dot(x_hi, m - m_hi) + dot(x - x_hi, m_hi)
    return jnp.dot(x, m, precision=_FIR_PRECISION,
                   preferred_element_type=jnp.float32)


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


def _fir_kernel(x_ref, halo_ref, m_ref, o_ref, *, block_rows, n_halo,
                halo_pad):
    # HIGHEST precision by default: the v5e MXU's DEFAULT f32 matmul
    # rounds inputs to bf16 (~3e-3 relative FIR error vs a float64
    # oracle — measured on hardware; invisible against the XLA conv
    # reference because conv rounds identically). The measured marginal
    # time (0.58 ms vs a 0.26 ms MXU floor at T=129 — docs/ROOFLINE.md)
    # says the 6-pass emulation is NOT free; "high" (3-pass) is the A/B
    # lever, soaked to < 1e-4 by benchmarks/pallas_soak.py.
    body = x_ref[0]                              # (block_rows, 128)
    acc = _dot_fir(body, m_ref[0])
    if n_halo > 0:
        ext = jnp.concatenate([halo_ref[0, 0], body], axis=0)
        for h in range(1, n_halo + 1):
            rows = ext[halo_pad - h:halo_pad - h + block_rows]
            acc = acc + _dot_fir(rows, m_ref[h])
    o_ref[0] = acc


@functools.lru_cache(maxsize=8)
def _batched_call(block_rows: int, mode: str = "highest"):
    # ``mode`` is an lru/jit cache key only (the kernel body reads the
    # env at trace time; without it an env flip mid-process would
    # silently reuse a stale compiled kernel).
    """pallas_call wrapper with a custom vmap rule.

    An outer ``vmap`` (e.g. a vmapped WBFM step) collapses into the
    kernel's own leading batch grid dimension instead of adding a block
    dim.
    """

    @jax.custom_batching.custom_vmap
    def call(x_body, x_halo, mats):
        return _fir_blocks(x_body, x_halo, mats, block_rows,
                           mode=mode)

    @call.def_vmap
    def _rule(axis_size, in_batched, x_body, x_halo, mats):  # noqa: ANN001
        x_b, h_b, m_b = in_batched
        if m_b:
            raise NotImplementedError("taps cannot be batched under vmap")
        if not x_b:
            return call(x_body, x_halo, mats), False
        if not h_b:
            x_halo = jnp.broadcast_to(x_halo, (axis_size,) + x_halo.shape)
        v, b = x_body.shape[:2]
        y = call(x_body.reshape((v * b,) + x_body.shape[2:]),
                 x_halo.reshape((v * b,) + x_halo.shape[2:]), mats)
        return y.reshape(v, b, *y.shape[1:]), True

    return call


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("block_rows", "mode"))
def _fir_blocks(x_body: jnp.ndarray, x_halo: jnp.ndarray,
                mats: jnp.ndarray, block_rows: int,
                mode: str = "highest") -> jnp.ndarray:
    """x_body: (batch, n_blocks·block_rows, 128); x_halo: (batch,
    n_blocks, halo_pad, 128) — block i's halo = the halo_pad rows just
    before block i (history rows for i = 0)."""
    batch, rows, _ = x_body.shape
    n_halo = mats.shape[0] - 1
    halo_pad = int(x_halo.shape[-2])
    n_blocks = rows // block_rows
    flops = 2 * (n_halo + 1) * LANES * rows * LANES * batch
    bytes_acc = 4 * (2 * batch * rows * LANES
                     + batch * n_blocks * halo_pad * LANES)
    return pl.pallas_call(
        functools.partial(_fir_kernel, block_rows=block_rows,
                          n_halo=n_halo, halo_pad=halo_pad),
        grid=(batch, n_blocks),
        in_specs=[
            pl.BlockSpec((1, block_rows, LANES), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, halo_pad, LANES), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mats.shape[0], LANES, LANES),
                         lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # band matrices resident
        ],
        out_specs=pl.BlockSpec((1, block_rows, LANES),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, rows, LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_acc,
                                      transcendentals=0),
        interpret=not has_tpu(),
    )(x_body, x_halo, mats)


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
    halo_pad = _round_up(max(n_halo, 1), SUBLANES)
    t_hist = halo_pad * LANES

    lead = x.shape[:-1]
    n = x.shape[-1]
    # Shrink the block to the signal: a 49 k-sample chunk is 384 rows —
    # padding it to one 512-row block wastes 33% of the HBM traffic.
    # Clamp at halo_pad: a shrunken block narrower than the halo slab
    # would make the prev_tails[-halo_pad:] slice under-sized (short
    # signals with very wide taps, e.g. n=2048 at ~2050 taps).
    block_rows = min(block_rows,
                     _round_up(-(-n // LANES), SUBLANES))
    block_rows = max(block_rows, halo_pad)
    x2 = x.reshape((-1, n)).astype(jnp.float32)
    batch = x2.shape[0]

    # Pad the signal tail to a whole number of blocks of rows.
    samples_per_block = block_rows * LANES
    n_pad = (-n) % samples_per_block
    if n_pad:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((batch, n_pad), jnp.float32)], axis=-1)
    n_blocks = x2.shape[-1] // samples_per_block
    x_body = x2.reshape(batch, -1, LANES)

    # History rows occupy the tail of block 0's halo slab.
    hist = jnp.zeros((batch, t_hist), jnp.float32)
    if history is not None:
        h = history.reshape((batch, -1)).astype(jnp.float32)
        hist = hist.at[:, t_hist - h.shape[-1]:].set(h)
    hist = hist.reshape(batch, 1, halo_pad, LANES)
    if n_blocks > 1:
        xr = x_body.reshape(batch, n_blocks, block_rows, LANES)
        prev_tails = xr[:, :-1, -halo_pad:, :]
        x_halo = jnp.concatenate([hist, prev_tails], axis=1)
    else:
        x_halo = hist

    y = _batched_call(block_rows, _fir_mode())(x_body, x_halo, mats)
    return y.reshape(batch, -1)[:, :n].reshape(lead + (n,))
