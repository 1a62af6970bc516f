"""Fused extraction + quadrature demod: band spectrum slice → windowed
IFFT → FM phase-difference demod in ONE Pallas pass.

Extends :mod:`extract_pallas` (slice+window+Nyquist+IFFT) one stage
further down the pipeline: the per-station time-domain IQ never touches
HBM at all. The kernel reads each station's slice of the band spectrum
(roll via BlockSpec index map), applies the window and Nyquist fold,
runs the backward transform in VMEM, computes the quadrature FM demod
``atan2(Im(x·conj(x₋₁)), Re(x·conj(x₋₁)))/π`` on the VPU, and writes
only the REAL quad signal: one c64 spectrum read + one f32 quad write —
half the fused-extraction kernel's output traffic and none of the demod
stage's separate read-modify-write passes.

Two tricks make the demod free of data movement:

* ``x[t−1]`` never requires a shift: it is the backward transform of
  ``u·e^{−2πik/m}`` — a SECOND transform of the same in-VMEM input with
  the delay twiddle folded into the window hook (doubles MXU work,
  which is not the bottleneck; adds zero HBM traffic).
* The extraction's ``(−1)^t`` roll flip (see extract_pallas) cancels in
  the product — ``y_t·conj(y_{t−1}) = −x̃_t·conj(x̃_{t−1})`` — and the
  angle is scale-invariant, so the resample normalization drops out
  too. Only the global minus sign and the reference's ``quad[0] = 0``
  chunk-edge convention (reference: ``radiocore/analog/fm.py:63``)
  survive.

Downstream, fast-mode WBFM needs only ``rfft(quad)`` (one transform —
:func:`fft_pallas.rfft_pow2_pallas` when enabled) and narrowband
envelope arithmetic; see ``models/wbfm.py`` mode='fast_spec' and
``parallel/pipeline.py``.

Row budget: the X and D tile sets are both VMEM-resident, so ``m`` is
capped at 2^18 (≈12 MB peak incl. Mosaic's block double-buffering;
2^19 would need ~24 MB of the ~16 MB VMEM).
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
    MIN_ROW, VMEM_LIMIT, _dft_planes, _dft_row_2d, _digits, _iota2,
    _row_flops, plan_sizes,
)

MAX_DEMOD_ROW = 1 << 18


def atan2_poly(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Four-quadrant arctangent from VPU-friendly primitives.

    Mosaic has no ``atan``/``atan2`` lowering (r4 smoke), so this is the
    classic octant reduction + odd minimax polynomial (Cephes ``atanf``
    coefficients): ``z = min/max ∈ [0,1]``, folded to ``[0, tan(π/8)]``
    via ``(z−1)/(z+1)``, degree-9 odd polynomial, then the octant/
    quadrant corrections as selects. Max abs error ~1e-6 rad vs float64
    (asserted by test) — far inside the demod chain's f32 noise floor.
    Matches ``np.arctan2`` conventions at y=0 (x>0 → 0, x<0 → π) and
    returns 0 at (0, 0).
    """
    ay = jnp.abs(y)
    ax = jnp.abs(x)
    hi = jnp.maximum(ay, ax)
    lo = jnp.minimum(ay, ax)
    # Guard must stay NORMAL in f32: XLA flushes subnormals (1e-38) to
    # zero, turning the origin into 0/0.
    z = lo / jnp.maximum(hi, jnp.float32(1e-30))        # [0, 1]
    big = z > jnp.float32(0.4142135623730950)           # tan(π/8)
    zr = jnp.where(big, (z - 1.0) / (z + 1.0), z)
    s = zr * zr
    p = ((jnp.float32(8.05374449538e-2) * s
          - jnp.float32(1.38776856032e-1)) * s
         + jnp.float32(1.99777106478e-1)) * s - jnp.float32(3.33329491539e-1)
    r = p * s * zr + zr
    r = jnp.where(big, r + jnp.float32(np.pi / 4), r)
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _extract_demod_kernel(*refs, sizes, m, inv_n, s_norm, gain):
    xr_ref, xi_ref, nxr_ref, nxi_ref = refs[:4]
    dft = {}
    for k, s in enumerate(sizes):
        dft[s] = (refs[4 + 2 * k][...], refs[5 + 2 * k][...])
    out_ref = refs[-1]
    a_n, b_n, c_n = _digits(m)

    # Raw-coordinate window (see extract_pallas: hann in closed form,
    # w[k] = ½·s_norm·(1 + cos(2π(k − m/2)/n)) for flat k = ia·BC + b·C
    # + ic) and the Nyquist fold u[0] += nxt·w[0].
    kk = _iota2((a_n, c_n), 0) * jnp.float32(b_n * c_n) \
        + _iota2((a_n, c_n), 1)
    half = jnp.float32(0.5 * s_norm)
    rad = jnp.float32(2.0 * np.pi * inv_n)
    w0 = jnp.float32(0.5 * s_norm * (1.0 + np.cos(np.pi * m * inv_n)))
    ia = jax.lax.broadcasted_iota(jnp.int32, (a_n, c_n), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (a_n, c_n), 1)
    at0 = (ia == 0) & (ic == 0)

    def pre_plain(cr, ci, b):
        ang = rad * (kk + jnp.float32(b * c_n - m // 2))
        w = half * (1.0 + jnp.cos(ang))
        ur = cr * w
        ui = ci * w
        if b == 0:
            ur = ur + jnp.where(at0, nxr_ref[0, 0, 0] * w0, 0.0)
            ui = ui + jnp.where(at0, nxi_ref[0, 0, 0] * w0, 0.0)
        return ur, ui

    def pre_delay(cr, ci, b):
        # Same windowed input times the one-sample delay twiddle
        # e^{−2πik/m}: IDFT(u·e^{−2πik/m})[t] = x̃[t−1] (circular).
        ur, ui = pre_plain(cr, ci, b)
        ang = jnp.float32(-2.0 * np.pi / m) * (kk + jnp.float32(b * c_n))
        dr, di = jnp.cos(ang), jnp.sin(ang)
        return ur * dr - ui * di, ur * di + ui * dr

    tiles_x = _dft_row_2d(xr_ref[0], xi_ref[0], dft, +1.0, m,
                          pre=pre_plain)
    tiles_d = _dft_row_2d(xr_ref[0], xi_ref[0], dft, +1.0, m,
                          pre=pre_delay)

    # quad[t] = gain·atan2(Im P, Re P), P = y_t·conj(y_{t−1})
    #         = −x̃_t·conj(x̃_{t−1}) (the (−1)^t flips cancel up to sign).
    g = jnp.float32(gain)
    vp0 = None
    for q in range(b_n):
        xr_q, xi_q = tiles_x[q]
        dr_q, di_q = tiles_d[q]
        pr = -(xr_q * dr_q + xi_q * di_q)
        pi = -(xi_q * dr_q - xr_q * di_q)
        quad = atan2_poly(pi, pr) * g
        if q == 0:
            # Chunk-edge convention quad[0] = 0 (t = 0 ⇔ v = p = 0).
            if vp0 is None:
                v0 = jax.lax.broadcasted_iota(jnp.int32, (c_n, a_n), 0)
                p0 = jax.lax.broadcasted_iota(jnp.int32, (c_n, a_n), 1)
                vp0 = (v0 == 0) & (p0 == 0)
            quad = jnp.where(vp0, 0.0, quad)
        out_ref[0, :, q * a_n:(q + 1) * a_n] = quad


@functools.partial(jax.jit,
                   static_argnames=("c", "m", "n", "r0", "s_norm", "gain"))
def _extract_demod_call(xr3, xi3, c: int, m: int, n: int, r0: int,
                        s_norm: float, gain: float):
    a_n, b_n, c_n = _digits(m)
    c2 = n // m
    sizes = tuple(plan_sizes(m))
    consts = []
    for s in sizes:
        dr, di = _dft_planes(s, +1.0)
        consts.extend([jnp.asarray(dr), jnp.asarray(di)])

    flops = 2 * _row_flops(m) * c + 8 * m * c
    bytes_acc = 4 * ((2 + 1) * c * m + sum(2 * s * s for s in sizes))
    trans = c * m * (2 * (1 if b_n == 1 else 2) * 2 + 1)

    row = pl.BlockSpec((1, a_n, b_n * c_n),
                       lambda i: ((i + r0) % c2, 0, 0),
                       memory_space=pltpu.VMEM)
    # Smallest Mosaic-legal window containing [0, 0, 0] (see
    # extract_pallas: last two block dims must divide (8, 128) or equal
    # the array's).
    nxt = pl.BlockSpec((1, a_n, 128), lambda i: ((i + r0 + 1) % c2, 0, 0),
                       memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec(cst.shape, functools.partial(
            lambda nd, *_: (0,) * nd, cst.ndim), memory_space=pltpu.VMEM)
        for cst in consts
    ]
    out = pl.BlockSpec((1, c_n, b_n * a_n), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_extract_demod_kernel, sizes=sizes, m=m,
                          inv_n=1.0 / n, s_norm=s_norm, gain=gain),
        grid=(c,),
        in_specs=[row, row, nxt, nxt] + const_specs,
        out_specs=[out],
        out_shape=[jax.ShapeDtypeStruct((c, c_n, b_n * a_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_acc,
                                      transcendentals=trans),
        compiler_params=VMEM_LIMIT,
        interpret=not has_tpu(),
    )(xr3, xi3, xr3, xi3, *consts)[0]


def _extract_demod_spec_kernel(*refs, sizes, m, inv_n, s_norm, gain,
                               keep_rows):
    """Extraction + demod + FORWARD transform: the composite spectrum
    ``rfft(quad)``'s full complex form leaves the kernel; the quad time
    series never touches HBM either.

    Requires A == C (m in [2^14, 2^18]): the natural-order (C, B·A)
    quad buffer and the forward pass's (A, B·C) input are then the SAME
    (128, B·128) memory — one VMEM scratch bridges the passes with no
    reshape/transpose (Mosaic has neither).
    """
    xr_ref, xi_ref, nxr_ref, nxi_ref = refs[:4]
    n_dft = 2 * len(sizes)
    dft_b = {}
    dft_f = {}
    for k, s in enumerate(sizes):
        dft_b[s] = (refs[4 + 2 * k][...], refs[5 + 2 * k][...])
        dft_f[s] = (refs[4 + n_dft + 2 * k][...],
                    refs[5 + n_dft + 2 * k][...])
    or_ref, oi_ref = refs[4 + 2 * n_dft], refs[5 + 2 * n_dft]
    quad_ref = refs[-1]                                  # VMEM scratch
    a_n, b_n, c_n = _digits(m)

    kk = _iota2((a_n, c_n), 0) * jnp.float32(b_n * c_n) \
        + _iota2((a_n, c_n), 1)
    half = jnp.float32(0.5 * s_norm)
    rad = jnp.float32(2.0 * np.pi * inv_n)
    w0 = jnp.float32(0.5 * s_norm * (1.0 + np.cos(np.pi * m * inv_n)))
    ia = jax.lax.broadcasted_iota(jnp.int32, (a_n, c_n), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (a_n, c_n), 1)
    at0 = (ia == 0) & (ic == 0)

    def pre_plain(cr, ci, b):
        ang = rad * (kk + jnp.float32(b * c_n - m // 2))
        w = half * (1.0 + jnp.cos(ang))
        ur = cr * w
        ui = ci * w
        if b == 0:
            ur = ur + jnp.where(at0, nxr_ref[0, 0, 0] * w0, 0.0)
            ui = ui + jnp.where(at0, nxi_ref[0, 0, 0] * w0, 0.0)
        return ur, ui

    def pre_delay(cr, ci, b):
        ur, ui = pre_plain(cr, ci, b)
        ang = jnp.float32(-2.0 * np.pi / m) * (kk + jnp.float32(b * c_n))
        dr, di = jnp.cos(ang), jnp.sin(ang)
        return ur * dr - ui * di, ur * di + ui * dr

    tiles_x = _dft_row_2d(xr_ref[0], xi_ref[0], dft_b, +1.0, m,
                          pre=pre_plain)
    tiles_d = _dft_row_2d(xr_ref[0], xi_ref[0], dft_b, +1.0, m,
                          pre=pre_delay)

    g = jnp.float32(gain)
    for q in range(b_n):
        xr_q, xi_q = tiles_x[q]
        dr_q, di_q = tiles_d[q]
        pr = -(xr_q * dr_q + xi_q * di_q)
        pi = -(xi_q * dr_q - xr_q * di_q)
        quad = atan2_poly(pi, pr) * g
        if q == 0:
            v0 = jax.lax.broadcasted_iota(jnp.int32, (c_n, a_n), 0)
            p0 = jax.lax.broadcasted_iota(jnp.int32, (c_n, a_n), 1)
            quad = jnp.where((v0 == 0) & (p0 == 0), 0.0, quad)
        quad_ref[:, q * a_n:(q + 1) * a_n] = quad

    # Forward pass over the scratch re-read in (A, B·C) interpretation
    # (identical memory when A == C). Real input: imag plane is zeros —
    # the dead matmuls ride the MXU, which is not the bottleneck here.
    qv = quad_ref[...]
    tiles_s = _dft_row_2d(qv, jnp.zeros_like(qv), dft_f, -1.0, m)
    # Bin s = v·BA + qA + p: keeping bins < keep_rows·BA keeps the first
    # keep_rows v-rows of every tile (the tail only reads low bins —
    # writing the rest would be wasted HBM traffic).
    for q, (vr, vi) in enumerate(tiles_s):
        or_ref[0, :, q * a_n:(q + 1) * a_n] = vr[:keep_rows]
        oi_ref[0, :, q * a_n:(q + 1) * a_n] = vi[:keep_rows]


@functools.partial(jax.jit,
                   static_argnames=("c", "m", "n", "r0", "s_norm", "gain",
                                    "keep_rows"))
def _extract_demod_spec_call(xr3, xi3, c: int, m: int, n: int, r0: int,
                             s_norm: float, gain: float, keep_rows: int):
    a_n, b_n, c_n = _digits(m)
    c2 = n // m
    sizes = tuple(plan_sizes(m))
    consts = []
    for sign in (+1.0, -1.0):
        for s in sizes:
            dr, di = _dft_planes(s, sign)
            consts.extend([jnp.asarray(dr), jnp.asarray(di)])

    flops = 3 * _row_flops(m) * c + 8 * m * c
    bytes_acc = int(4 * ((2 + 2 * keep_rows / c_n) * c * m
                         + 2 * sum(2 * s * s for s in sizes)))
    trans = c * m * (3 * (1 if b_n == 1 else 2) * 2)

    row = pl.BlockSpec((1, a_n, b_n * c_n),
                       lambda i: ((i + r0) % c2, 0, 0),
                       memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec((1, a_n, 128), lambda i: ((i + r0 + 1) % c2, 0, 0),
                       memory_space=pltpu.VMEM)
    const_specs = [
        pl.BlockSpec(cst.shape, functools.partial(
            lambda nd, *_: (0,) * nd, cst.ndim), memory_space=pltpu.VMEM)
        for cst in consts
    ]
    out = pl.BlockSpec((1, keep_rows, b_n * a_n), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_extract_demod_spec_kernel, sizes=sizes, m=m,
                          inv_n=1.0 / n, s_norm=s_norm, gain=gain,
                          keep_rows=keep_rows),
        grid=(c,),
        in_specs=[row, row, nxt, nxt] + const_specs,
        out_specs=[out, out],
        out_shape=[jax.ShapeDtypeStruct((c, keep_rows, b_n * a_n),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((c, keep_rows, b_n * a_n),
                                        jnp.float32)],
        scratch_shapes=[pltpu.VMEM((c_n, b_n * a_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_acc,
                                      transcendentals=trans),
        compiler_params=VMEM_LIMIT,
        interpret=not has_tpu(),
    )(xr3, xi3, xr3, xi3, *consts)


def extract_demod_spec_ok(n: int, m: int, c: int) -> bool:
    """Whether the spectrum-output fused kernel supports this plan
    (extract_demod_ok AND A == C, i.e. m in [2^14, 2^18])."""
    if not extract_demod_ok(n, m, c):
        return False
    a_n, _b, c_n = _digits(m)
    return a_n == c_n


def extract_demod_spec_rows_pallas(spectrum: jnp.ndarray, a0: int,
                                   c: int, m: int,
                                   gain: float | None = None,
                                   keep_bins: int | None = None
                                   ) -> jnp.ndarray:
    """Extraction + FM demod + composite spectrum, one kernel pass.

    ``spectrum (n,) c64 → q_spec (c, K) c64`` where
    ``q_spec ≡ fft(quadrature_demod(extracted_iq))[:, :K]`` (real input
    ⇒ bins below ``m//2 + 1`` are ``rfft(quad)``). ``keep_bins`` bounds
    the bins actually WRITTEN (rounded up to the kernel's 8-row tile
    granularity; ``K ≥ keep_bins``): the fast-WBFM tail only reads the
    low ~quarter of the spectrum, and the rest would be pure wasted HBM
    write traffic. Default: the full ``m`` bins.
    """
    n = int(spectrum.shape[-1])
    if spectrum.ndim != 1:
        raise ValueError("extract_demod_spec_rows_pallas: 1-D only")
    if not extract_demod_spec_ok(n, m, c):
        raise ValueError(f"extract_demod_spec_rows_pallas: unsupported "
                         f"plan n={n} m={m} c={c}")
    if gain is None:
        gain = 1.0 / np.pi
    a_n, b_n, c_n = _digits(m)
    ba = b_n * a_n
    if keep_bins is None:
        keep_rows = c_n
    else:
        if not (0 < keep_bins <= m):
            raise ValueError(f"keep_bins {keep_bins} out of (0, {m}]")
        keep_rows = min(c_n, ((-(-int(keep_bins) // ba) + 7) // 8) * 8)
    xr = jnp.real(spectrum).astype(jnp.float32)
    xi = jnp.imag(spectrum).astype(jnp.float32)
    if a0 % m:
        xr = jnp.concatenate([xr[a0:], xr[:a0]])
        xi = jnp.concatenate([xi[a0:], xi[:a0]])
        r0 = 0
    else:
        r0 = a0 // m
    xr3 = xr.reshape(n // m, a_n, b_n * c_n)
    xi3 = xi.reshape(n // m, a_n, b_n * c_n)
    s_norm = 1.0 / ((n / m) * m)
    sr, si = _extract_demod_spec_call(xr3, xi3, c, m, n, r0,
                                      float(s_norm), float(gain),
                                      int(keep_rows))
    return jax.lax.complex(sr, si).reshape(c, keep_rows * ba)


def extract_demod_ok(n: int, m: int, c: int) -> bool:
    """Whether the fused extract+demod kernel supports this plan."""
    return ((m & (m - 1)) == 0 and MIN_ROW <= m <= MAX_DEMOD_ROW
            and n % m == 0 and n // m >= 2 and c <= n // m)


def extract_demod_rows_pallas(spectrum: jnp.ndarray, a0: int, c: int,
                              m: int, gain: float | None = None
                              ) -> jnp.ndarray:
    """Uniform-plan extraction + FM quadrature demod, one kernel pass.

    ``spectrum (n,) c64 → quad (c, m) f32``: station i's windowed IQ run
    starts at spectrum bin ``(a0 + i·m) mod n`` (extract_rows_pallas
    semantics), immediately demodulated —
    ``quad ≡ ops.demod.quadrature_demod(extracted_iq)`` with the
    reference's leading-zero padding. ``gain`` defaults to ``1/π``.
    """
    n = int(spectrum.shape[-1])
    if spectrum.ndim != 1:
        raise ValueError("extract_demod_rows_pallas: 1-D spectrum only")
    if not extract_demod_ok(n, m, c):
        raise ValueError(f"extract_demod_rows_pallas: unsupported plan "
                         f"n={n} m={m} c={c}")
    if gain is None:
        gain = 1.0 / np.pi
    xr = jnp.real(spectrum).astype(jnp.float32)
    xi = jnp.imag(spectrum).astype(jnp.float32)
    if a0 % m:
        xr = jnp.concatenate([xr[a0:], xr[:a0]])
        xi = jnp.concatenate([xi[a0:], xi[:a0]])
        r0 = 0
    else:
        r0 = a0 // m
    a_n, b_n, c_n = _digits(m)
    xr3 = xr.reshape(n // m, a_n, b_n * c_n)
    xi3 = xi.reshape(n // m, a_n, b_n * c_n)
    # s_norm only shapes magnitudes (the angle is scale-invariant); use
    # the extraction's own normalization for healthy f32 ranges.
    s_norm = 1.0 / ((n / m) * m)
    q = _extract_demod_call(xr3, xi3, c, m, n, r0, float(s_norm),
                            float(gain))
    return q.reshape(c, m)
