"""Fused channel extraction: slice + window + Nyquist fix + IFFT in ONE
Pallas kernel pass (SURVEY §7.2 item 5 — the fused-pipeline hot spot).

Motivation (measured, extract_profile.json r3): the extraction stage is
the fused pipeline's dominant cost, and MOST of it is not the IFFT —
the XLA reorder/window alone (concatenate of rolled halves + window
multiply over the (C, m) rows) runs at 35 GB/s, ~23× off the HBM
roofline, because the concatenates materialize multiple intermediate
passes. This kernel reads each station's slice of the band spectrum
straight out of HBM (a BlockSpec index map expresses the roll — no data
movement), applies the window, fixes the Nyquist bin, runs the whole
backward transform in VMEM on the MXU, and writes time-domain station
IQ: one HBM read of the spectrum + one write of the stations, the
literal traffic floor.

The reorder disappears into math (derivation checked against
``ops.channelize.extract_uniform``, reference semantics
``radiocore/tools/tuner.py:137-161``):

* Channel c's windowed run ``y`` is a half-spectrum roll of a raw
  contiguous row ``u``: ``y[j] = u[(j + m/2) mod m]``. A backward DFT
  turns that roll into an output sign flip —
  ``IDFT(y)[t] = (−1)^t · IDFT(u)[t]`` — so no data is ever reordered.
* The hann window in raw coordinates is the closed form
  ``w[k] = ½(1 + cos(2π(k − m/2)/n))`` for ALL k — including k = 0,
  where the fftshifted-hann symmetry makes the even-m "fix" weight
  (``win[n − m/2]``) the natural continuation. No window constant, no
  special case: it is generated from iota in-kernel and fused into the
  input scale.
* The Nyquist fold (scipy resample's unpaired-bin handling) reduces to
  ``u[0] = (x[0] + nxt) · w[0]`` where ``nxt`` is the NEXT station
  row's first element — fetched by aliasing the same spectrum operand
  with a +1-row index map (zero extra traffic).

The transform body is :func:`fft_pallas._dft_row_2d` — the three-digit
2-D-only Cooley–Tukey (MXU matmuls at ``Precision.HIGHEST``) shared
with the whole-row FFT kernel; its ``pre`` hook applies the window to
each 128-aligned column chunk before the stage-1 contraction, and its
(C, B·A) natural-order output tiles make the roll flip a per-column
``(−1)^p`` sign over each (v, p) tile (A is an even power of two, so
``t = v·BA + q·A + p`` has the parity of ``p``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiocore_tpu.runtime.platform import has_tpu
from radiocore_tpu.kernels.fft_pallas import (
    MAX_ROW, MIN_ROW, VMEM_LIMIT, _dft_planes, _dft_row_2d, _digits,
    _iota2, _row_flops, plan_sizes,
)


def _extract_kernel(*refs, sizes, m, inv_n, s_norm):
    xr_ref, xi_ref, nxr_ref, nxi_ref = refs[:4]
    dft = {}
    for k, s in enumerate(sizes):
        dft[s] = (refs[4 + 2 * k][...], refs[5 + 2 * k][...])
    or_ref, oi_ref = refs[-2], refs[-1]
    a_n, b_n, c_n = _digits(m)

    # Raw-coordinate flat index of chunk-b element (ia, ic) is
    # k = ia·(B·C) + b·C + ic; the window is the closed form
    # w[k] = ½·s_norm·(1 + cos(2π(k − m/2)/n)) — exact in f32 for
    # k < m ≤ 2^19.
    kk = _iota2((a_n, c_n), 0) * jnp.float32(b_n * c_n) \
        + _iota2((a_n, c_n), 1)
    half = jnp.float32(0.5 * s_norm)
    rad = jnp.float32(2.0 * np.pi * inv_n)
    # Nyquist fold weight w[0] = ½·s_norm·(1 + cos(πm/n)).
    w0 = jnp.float32(0.5 * s_norm * (1.0 + np.cos(np.pi * m * inv_n)))
    ia = jax.lax.broadcasted_iota(jnp.int32, (a_n, c_n), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (a_n, c_n), 1)
    at0 = (ia == 0) & (ic == 0)

    def pre(cr, ci, b):
        ang = rad * (kk + jnp.float32(b * c_n - m // 2))
        w = half * (1.0 + jnp.cos(ang))
        ur = cr * w
        ui = ci * w
        if b == 0:
            # u[0] = (x[0] + nxt)·w[0]; x[0]·w[0] is already in.
            ur = ur + jnp.where(at0, nxr_ref[0, 0, 0] * w0, 0.0)
            ui = ui + jnp.where(at0, nxi_ref[0, 0, 0] * w0, 0.0)
        return ur, ui

    tiles = _dft_row_2d(xr_ref[0], xi_ref[0], dft, +1.0, m, pre=pre)

    # y[j] = u[(j + m/2) mod m] ⇒ out[t] = (−1)^t·IDFT(u)[t]; output
    # flat order is t = v·BA + q·A + p with A even, so (−1)^t = (−1)^p —
    # a per-column sign flip over the LAST axis of each (v, p) tile.
    p = jax.lax.broadcasted_iota(jnp.int32, (c_n, a_n), 1)
    flip = (1 - 2 * (p & 1)).astype(jnp.float32)
    for q, (vr, vi) in enumerate(tiles):
        or_ref[0, :, q * a_n:(q + 1) * a_n] = vr * flip
        oi_ref[0, :, q * a_n:(q + 1) * a_n] = vi * flip


@functools.partial(jax.jit,
                   static_argnames=("c", "m", "n", "r0", "s_norm"))
def _extract_call(xr3, xi3, c: int, m: int, n: int, r0: int,
                  s_norm: float):
    a_n, b_n, c_n = _digits(m)
    c2 = n // m                                        # rows in the view
    sizes = tuple(plan_sizes(m))
    consts = []
    for s in sizes:
        dr, di = _dft_planes(s, +1.0)
        consts.extend([jnp.asarray(dr), jnp.asarray(di)])

    flops = _row_flops(m) * c
    bytes_acc = 4 * (2 * (c + c) * m + sum(2 * s * s for s in sizes))
    trans = c * m * (1 if b_n == 1 else 2) * 2

    # Affine index maps when no wraparound can occur (r0 == 0 and the
    # +1-row neighbour stays in range): a modular index function is a
    # prefetch hazard for the pipeliner — the r0 == 0 form lets the
    # caller A/B "one XLA roll pass + affine maps" against the in-place
    # modular maps (benchmarks/extract_profile.py).
    if r0 == 0:
        row = pl.BlockSpec((1, a_n, b_n * c_n), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        # The bulk stream is affine; only the tiny one-element
        # neighbour window may wrap (last station).
        nxt = pl.BlockSpec((1, a_n, 128),
                           lambda i: ((i + 1) % c2, 0, 0),
                           memory_space=pltpu.VMEM)
    else:
        row = pl.BlockSpec((1, a_n, b_n * c_n),
                           lambda i: ((i + r0) % c2, 0, 0),
                           memory_space=pltpu.VMEM)
        # Mosaic requires the block's last two dims divisible by (8,
        # 128) or equal to the array's: a (1, a_n, 128) block is the
        # smallest legal window containing the one element [0, 0, 0] we
        # read (≤64 KB vs the row's MBs — negligible extra traffic).
        nxt = pl.BlockSpec((1, a_n, 128),
                           lambda i: ((i + r0 + 1) % c2, 0, 0),
                           memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec(cst.shape, functools.partial(
            lambda nd, *_: (0,) * nd, cst.ndim), memory_space=pltpu.VMEM)
        for cst in consts
    ]
    out = pl.BlockSpec((1, c_n, b_n * a_n), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_extract_kernel, sizes=sizes, m=m,
                          inv_n=1.0 / n, s_norm=s_norm),
        grid=(c,),
        in_specs=[row, row, nxt, nxt] + const_specs,
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((c, c_n, b_n * a_n), jnp.float32),
                   jax.ShapeDtypeStruct((c, c_n, b_n * a_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_acc,
                                      transcendentals=trans),
        compiler_params=VMEM_LIMIT,
        interpret=not has_tpu(),
    )(xr3, xi3, xr3, xi3, *consts)


def extract_ok(n: int, m: int, c: int) -> bool:
    """Whether the fused kernel supports this uniform extraction plan."""
    return ((m & (m - 1)) == 0 and MIN_ROW <= m <= MAX_ROW
            and n % m == 0 and n // m >= 2 and c <= n // m)


def extract_rows_pallas(spectrum: jnp.ndarray, a0: int, c: int, m: int,
                        s_norm: float) -> jnp.ndarray:
    """Uniform-plan channel extraction, fused in one kernel pass.

    ``spectrum (n,) c64 → stations (c, m) c64`` (time domain), matching
    ``make_extractor``'s uniform path with hann windowing: station i's
    run starts at spectrum bin ``(a0 + i·m) mod n``. ``s_norm`` is the
    total scale (``1/(s_fac·m)`` — resample gain × IFFT normalization).

    When ``a0`` is m-aligned the kernel reads the spectrum IN PLACE
    (the roll lives in the BlockSpec index map); otherwise one XLA roll
    pass makes the rows contiguous first.
    """
    n = int(spectrum.shape[-1])
    if spectrum.ndim != 1:
        raise ValueError("extract_rows_pallas: 1-D spectrum only")
    if not extract_ok(n, m, c):
        raise ValueError(f"extract_rows_pallas: unsupported plan "
                         f"n={n} m={m} c={c}")
    xr = jnp.real(spectrum).astype(jnp.float32)
    xi = jnp.imag(spectrum).astype(jnp.float32)
    if a0 % m:
        xr = jnp.concatenate([xr[a0:], xr[:a0]])
        xi = jnp.concatenate([xi[a0:], xi[:a0]])
        r0 = 0
    else:
        r0 = a0 // m
        import os
        if r0 and os.environ.get("RADIOCORE_TPU_EXTRACT_PREROLL") == "1":
            # A/B knob: one XLA row-granular roll pass (~0.33 ms at the
            # 64×2^18 shape) buys AFFINE kernel index maps — modular
            # index functions are a pipeliner-prefetch hazard suspect
            # (docs/ROOFLINE.md extraction gap).
            xr = jnp.concatenate([xr[r0 * m:], xr[:r0 * m]])
            xi = jnp.concatenate([xi[r0 * m:], xi[:r0 * m]])
            r0 = 0
    a_n, b_n, c_n = _digits(m)
    xr3 = xr.reshape(n // m, a_n, b_n * c_n)
    xi3 = xi.reshape(n // m, a_n, b_n * c_n)
    yr, yi = _extract_call(xr3, xi3, c, m, n, r0, float(s_norm))
    return jax.lax.complex(yr, yi).reshape(c, m)
