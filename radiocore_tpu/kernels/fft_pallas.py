"""Whole-row pow2 FFT in VMEM: DFT matmuls on the MXU (Pallas).

Motivation (measured, BENCH_r02/fft_micro): XLA TPU's FFT custom call
runs large batched transforms at ~15-30× their HBM-traffic floor — the
extraction stage's 64×262144 batched IFFT and the 2^24 band FFT are
the fused pipeline's two dominant costs. A length-2^18 c64 row is only
2 MB, so the ENTIRE transform fits in VMEM: one HBM read + one HBM
write (the literal roofline) with all butterfly passes on-chip.

Formulation — three-digit Cooley–Tukey with 2-D-ONLY vector ops.
Mosaic (the Pallas TPU compiler) rejects reshapes that merge a
non-lane-aligned trailing dim ("infer-vector-layout: unsupported shape
cast", hit on hardware r3) and general transposes, so the classic
recursive four-step (reshape → swapaxes at every level) cannot lower.
Instead ``m = A·B·C`` with ``C = 128`` lanes, ``B ≤ 32`` (1 when
``m ≤ 2^14``), ``A ≤ 128``, and the row ``x[k]``, ``k = a·BC + b·C + c``
is processed as a single (A, B·C) 2-D block:

* stage 1 (MXU): contract the *a* digit — a left matmul by the A×A DFT
  matrix on each 128-aligned column chunk ``x[:, bC:(b+1)C]``, fused
  with the level-1 twiddle ``W1[p, bC+c]`` (iota → cos/sin in-kernel);
* stage 2 (VPU): contract the *b* digit — ``B ≤ 32``, so it unrolls to
  scalar·tile multiply-adds with the B-point DFT coefficients baked as
  Python-float constants (no matmul, no reshape), then the level-2
  twiddle ``W2[q, c]``;
* stage 3 (MXU): contract the *c* digit — ``dot_general`` with BOTH
  contraction dims last (``D_C ∘ Uᵀ``), which lands the result tile
  directly in (v, p) orientation;
* output: tile (v, p) of sub-transform q stores to the 128-aligned
  column slice ``out[:, qA:(q+1)A]`` of a (C, B·A) block — row-major
  flat index ``v·BA + q·A + p`` IS the natural DFT order
  ``t = p + A·q + AB·v``, so no reorder pass exists anywhere.

Everything is 2-D: matmuls, iota, elementwise, and static 128-aligned
column slices. No reshape of vector values, no transpose, no gather.

* Twiddles are computed in-kernel (int32 broadcasted_iota → f32 →
  cos/sin; Mosaic's ``tpu.iota`` is integer-only): ``p·(bC+c) < m ≤
  2^19`` is exact in f32, so phase error is ~2πε independent of m
  (same argument as the planner's on-device twiddles, ops/fft.py).
* Complex is planar f32 (Mosaic has no c64): 4 real matmuls per
  complex matmul at ``Precision.HIGHEST`` (the v5e MXU's DEFAULT
  rounds f32 inputs to bf16 — the round-2 correctness discovery).

There is no reference analog (the reference delegates to cuFFT,
reference: ``radiocore/tools/tuner.py:137-138``); this kernel exists to
put the batched-FFT stages at the chip's memory speed of light
(BASELINE.md "FIR + FFT kernel throughput ~HBM-bandwidth per chip").
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiocore_tpu.runtime.platform import has_tpu

LANES = 128
MAX_ROW = 1 << 19       # VMEM budget: 2 planes × 2 MB in/out + temps
MIN_ROW = 256
MAX_GROUP = 8           # short-row batching unrolls the kernel body

# XLA's default scoped-vmem limit is 16 MB; at m = 2^18 with grid ≥ 48
# Mosaic's buffering pushed the kernel to 18.4 MB and the compile died
# (an "HTTP 500 compile-helper exit 1" through the relay — the real
# error was the scoped-vmem OOM in its log tail, r4 bisect). Raise the
# limit for every kernel in this family; it is a cap, not a
# reservation.
VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _digits(m: int) -> Tuple[int, int, int]:
    """m = A·B·C, C = 128 lanes, B the small VPU digit (1 if 2-level)."""
    rest = m // LANES
    if rest <= LANES:
        return rest, 1, LANES
    return LANES, rest // LANES, LANES


def plan_sizes(length: int) -> List[int]:
    """Distinct DFT-matrix sizes a length-``length`` row FFT needs on
    the MXU (the B digit is baked as scalars, not a matrix)."""
    a, _b, c = _digits(length)
    return [a] if a == c else [a, c]


@functools.lru_cache(maxsize=64)
def _dft_planes(size: int, sign: float) -> Tuple[np.ndarray, np.ndarray]:
    """(real, imag) planes of the size×size DFT matrix, float64-derived."""
    j = np.arange(size, dtype=np.float64)
    ang = sign * 2.0 * np.pi * np.outer(j, j) / size
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


# Complex-matmul form: "4mm" (4 real matmuls — default) or "3mm"
# (Karatsuba: 25% fewer MXU FLOPs at the cost of one extra elementwise
# add and mild cancellation error — worth it only if the hardware soak
# shows the kernel compute-bound rather than HBM-bound).
_CMUL = os.environ.get("RADIOCORE_TPU_FFT_CMUL", "4mm")

# MXU pass count for the DFT matmuls: "highest" = 6-pass bf16 emulation
# (full f32, ~5e-7), "3pass" = hand-rolled bf16x3 (XLA's HIGH scheme —
# half the MXU time, ~1e-5 class; Mosaic rejects lax.Precision.HIGH
# itself with "Unsupported dot precision", measured r5 smoke, so the
# decomposition a·b ≈ hi·hi + hi·lo + lo·hi is written out with
# DEFAULT-precision bf16 dots). The kernel's cost model says it is
# MXU-bound (docs/ROOFLINE.md), so this is the single cheapest
# throughput lever — A/B'd by benchmarks/pallas_soak.py --fft, which
# asserts rel < 1e-4 either way.
def _mm_mode() -> str:
    raw = os.environ.get("RADIOCORE_TPU_FFT_MM_PRECISION")
    if raw:
        return raw.lower()
    # TPU default since r5: 3pass — soaked 5-6e-6 (< the 1e-4 gate,
    # FFT_SOAK_3pass_r05.json), rows 2.03 vs 2.66 ms, pipeline 17.80 vs
    # 19.08 ms/step (BENCH_3pass_r05.json). CPU (interpret-mode tests,
    # 2e-6 parity bounds) stays HIGHEST.
    return "3pass" if has_tpu() else "highest"


_MM_PRECISION = jax.lax.Precision.HIGHEST


def _mm_3pass(a, b, dn):
    """f32 matmul via 3 bf16 passes (drops the lo·lo term)."""
    dnums = (dn, ((), ()))

    def dot(x, y):
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), y.astype(jnp.bfloat16), dnums,
            preferred_element_type=jnp.float32)

    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    return dot(a_hi, b_hi) + dot(a_hi, b - b_hi) + dot(a - a_hi, b_hi)

# dot_general dimension numbers: LEFT = D @ X (contract D's cols with
# X's rows); NT = D @ Xᵀ (contract the LAST dim of both — the stage-3
# form whose result lands pre-transposed in (v, p) orientation).
_DN_LEFT = ((1,), (0,))
_DN_NT = ((1,), (1,))


def _cmm(dr, di, xr, xi, dn):
    """Complex 2-D matmul from planar f32 planes on the MXU."""
    hi = _MM_PRECISION

    if _mm_mode() == "3pass":
        def mm(a, b):
            return _mm_3pass(a, b, dn)
    else:
        def mm(a, b):
            return jax.lax.dot_general(a, b, (dn, ((), ())),
                                       precision=hi,
                                       preferred_element_type=jnp.float32)

    if _CMUL == "3mm":
        # (dr + i·di)(xr + i·xi): m1 = dr·xr, m2 = di·xi,
        # m3 = (dr+di)(xr+xi); yr = m1 − m2, yi = m3 − m1 − m2.
        m1 = mm(dr, xr)
        m2 = mm(di, xi)
        m3 = mm(dr + di, xr + xi)
        return m1 - m2, m3 - m1 - m2
    return mm(dr, xr) - mm(di, xi), mm(dr, xi) + mm(di, xr)


def _iota2(shape, dim):
    """Integer 2-D iota → f32 (Mosaic's tpu.iota is integer-only)."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
        jnp.float32)


def _dft_row_2d(xr, xi, dft: Dict[int, Tuple], sign: float, m: int,
                pre=None) -> List[Tuple]:
    """One row's DFT with 2-D-only ops.

    ``xr/xi``: (A, B·C) planar f32 planes of the row (k = a·BC + b·C + c
    row-major). ``dft``: in-VMEM (real, imag) DFT matrices for sizes A
    and C. ``pre(cr, ci, b)``: optional elementwise preprocess of column
    chunk b (the fused-extraction window hook).

    Returns ``[(vr_q, vi_q)] * B`` — per-q (C, A) tiles in (v, p)
    orientation; tile q belongs at output columns ``[qA, (q+1)A)`` of
    the (C, B·A) natural-order block.
    """
    a_n, b_n, c_n = _digits(m)
    dra, dia = dft[a_n]
    drc, dic = dft[c_n]
    s2pi = sign * 2.0 * np.pi

    # Stage 1 + W1, per 128-aligned column chunk.
    tb: List[Tuple] = []
    pp = _iota2((a_n, c_n), 0)
    cc = _iota2((a_n, c_n), 1)
    for b in range(b_n):
        cr = xr[:, b * c_n:(b + 1) * c_n]
        ci = xi[:, b * c_n:(b + 1) * c_n]
        if pre is not None:
            cr, ci = pre(cr, ci, b)
        gr, gi = _cmm(dra, dia, cr, ci, _DN_LEFT)
        ang = jnp.float32(s2pi / m) * (pp * (cc + jnp.float32(b * c_n)))
        wr, wi = jnp.cos(ang), jnp.sin(ang)
        tb.append((gr * wr - gi * wi, gr * wi + gi * wr))

    if b_n == 1:
        return [_cmm(drc, dic, tb[0][0], tb[0][1], _DN_NT)]

    # Stage 2 (VPU, coefficients baked as scalars) + W2 + stage 3.
    dbr, dbi = _dft_planes(b_n, sign)
    out: List[Tuple] = []
    for q in range(b_n):
        ur = None
        ui = None
        for b in range(b_n):
            r, i2 = tb[b]
            c1 = float(dbr[q, b])
            c2 = float(dbi[q, b])
            tr = c1 * r - c2 * i2
            ti = c1 * i2 + c2 * r
            ur = tr if ur is None else ur + tr
            ui = ti if ui is None else ui + ti
        if q:
            ang = jnp.float32(s2pi * q / (b_n * c_n)) * cc
            w2r, w2i = jnp.cos(ang), jnp.sin(ang)
            ur, ui = ur * w2r - ui * w2i, ur * w2i + ui * w2r
        out.append(_cmm(drc, dic, ur, ui, _DN_NT))
    return out


def _row_flops(m: int) -> int:
    a_n, b_n, c_n = _digits(m)
    return 8 * m * (a_n + b_n + c_n)


def _fft_kernel(*refs, sizes, sign, m, group):
    xr_ref, xi_ref = refs[0], refs[1]
    dft = {}
    for k, s in enumerate(sizes):
        dft[s] = (refs[2 + 2 * k][...], refs[3 + 2 * k][...])
    or_ref, oi_ref = refs[-2], refs[-1]
    a_n, _b_n, _c_n = _digits(m)
    for j in range(group):
        tiles = _dft_row_2d(xr_ref[j], xi_ref[j], dft, sign, m)
        for q, (vr, vi) in enumerate(tiles):
            or_ref[j, :, q * a_n:(q + 1) * a_n] = vr
            oi_ref[j, :, q * a_n:(q + 1) * a_n] = vi


@functools.partial(jax.jit, static_argnames=("sign", "group", "mm_mode"))
def _fft_call(xr: jnp.ndarray, xi: jnp.ndarray, sign: float, group: int,
              mm_mode: str = "highest"):
    del mm_mode  # jit-cache key only: _cmm reads the env at trace time,
    # and without the mode in the key an env flip mid-process would
    # silently reuse a stale compiled kernel.
    """xr/xi: (batch, A, B·C) f32 → (batch, C, B·A) planar DFT rows
    whose row-major flat order is the natural DFT order.

    ``group`` rows are processed per grid step (the wrapper targets
    ~2^18 elements of work per step, capped at MAX_GROUP — the row
    body is unrolled per group member) so short transforms stay
    pipelined instead of dispatch-bound.
    """
    batch, a_n, bc = xr.shape
    length = a_n * bc
    _, b_n, c_n = _digits(length)
    sizes = tuple(plan_sizes(length))
    consts = []
    for s in sizes:
        dr, di = _dft_planes(s, sign)
        consts.extend([jnp.asarray(dr), jnp.asarray(di)])

    flops = _row_flops(length) * batch
    bytes_acc = 4 * (4 * batch * length + sum(2 * s * s for s in sizes))
    trans = 2 * batch * length * (1 if b_n == 1 else 2)

    const_specs = [
        pl.BlockSpec(c.shape, functools.partial(lambda nd, *_: (0,) * nd,
                                                c.ndim),
                     memory_space=pltpu.VMEM) for c in consts
    ]
    row_spec = pl.BlockSpec((group, a_n, bc), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((group, c_n, b_n * a_n), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fft_kernel, sizes=sizes, sign=sign,
                          m=length, group=group),
        grid=(batch // group,),
        in_specs=[row_spec, row_spec] + const_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((batch, c_n, b_n * a_n), jnp.float32),
            jax.ShapeDtypeStruct((batch, c_n, b_n * a_n), jnp.float32)],
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_acc,
                                      transcendentals=trans),
        compiler_params=VMEM_LIMIT,
        interpret=not has_tpu(),
    )(xr, xi, *consts)


def _check_row(length: int) -> Tuple[int, int]:
    if length & (length - 1) or not (MIN_ROW <= length <= MAX_ROW):
        raise ValueError(
            f"fft_pow2_pallas: row length {length} unsupported "
            f"(pow2 in [{MIN_ROW}, {MAX_ROW}])")
    a_n, b_n, c_n = _digits(length)
    return a_n, b_n * c_n


def fft_pow2_pallas_planar(xr: jnp.ndarray, xi: jnp.ndarray,
                           sign: float = -1.0):
    """Unnormalized DFT along the last axis, planar f32 in/out.

    ``(..., L)`` with pow2 ``L`` in [256, 2^19]; arbitrary leading batch
    dims. ``sign=-1`` forward, ``+1`` backward (caller scales by 1/L).
    """
    length = int(xr.shape[-1])
    a1, b1 = _check_row(length)
    lead = xr.shape[:-1]
    xr3 = xr.reshape((-1, a1, b1)).astype(jnp.float32)
    xi3 = xi.reshape((-1, a1, b1)).astype(jnp.float32)
    batch = xr3.shape[0]
    # Group short rows (~2^18 elements of work per grid step, capped:
    # the kernel body unrolls per group member) so small transforms
    # stay pipelined instead of dispatch-bound. A batch that isn't a
    # multiple of the target group is PADDED up to one — the pad costs
    # ≤ (group−1) extra rows of HBM traffic, far cheaper than the up-to
    # 8× grid-step increase of degrading to a small divisor (a batch of
    # 61 short rows used to fall all the way to group=1).
    group = min(max((1 << 18) // length, 1), batch, MAX_GROUP)
    pad = (-batch) % group
    if pad:
        zeros = jnp.zeros((pad,) + xr3.shape[1:], jnp.float32)
        xr3 = jnp.concatenate([xr3, zeros])
        xi3 = jnp.concatenate([xi3, zeros])
    yr, yi = _fft_call(xr3, xi3, float(sign), group, mm_mode=_mm_mode())
    if pad:
        yr, yi = yr[:batch], yi[:batch]
    return (yr.reshape(lead + (length,)), yi.reshape(lead + (length,)))


def fft_pow2_pallas(x: jnp.ndarray, sign: float = -1.0) -> jnp.ndarray:
    """Unnormalized DFT along the last axis of a c64 array (pow2 rows)."""
    x = jnp.asarray(x)
    if not jnp.iscomplexobj(x):
        x = x.astype(jnp.complex64)
    yr, yi = fft_pow2_pallas_planar(jnp.real(x), jnp.imag(x), sign)
    return jax.lax.complex(yr, yi)


def ifft_pow2_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """Normalized inverse counterpart of :func:`fft_pow2_pallas`."""
    return fft_pow2_pallas(x, sign=+1.0) / x.shape[-1]


@functools.lru_cache(maxsize=64)
def _half_twiddle(n: int, sign: float) -> np.ndarray:
    """exp(sign·2πi·k/n) for k = 0..n/2 (float64-derived c64 constant)."""
    k = np.arange(n // 2 + 1, dtype=np.float64)
    return np.exp(sign * 2j * np.pi * k / n).astype(np.complex64)


def rfft_pow2_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """Real-input FFT along the last axis → ``n//2 + 1`` bins.

    Standard half-length trick: pack even/odd samples as real/imag of a
    length-n/2 complex row, run the VMEM kernel, untangle with the
    conjugate-symmetric/antisymmetric split (elementwise — XLA fuses it
    with the kernel's output pass).
    """
    n = int(x.shape[-1])
    h = n // 2
    _check_row(h)
    v = x.astype(jnp.float32).reshape(x.shape[:-1] + (h, 2))
    zr, zi = fft_pow2_pallas_planar(v[..., 0], v[..., 1], -1.0)
    z = jax.lax.complex(zr, zi)
    zf = jnp.concatenate([z, z[..., :1]], axis=-1)          # Z[h] = Z[0]
    zrev = jnp.conj(zf[..., ::-1])
    ze = 0.5 * (zf + zrev)
    zo = -0.5j * (zf - zrev)
    w = jnp.asarray(_half_twiddle(n, -1.0))
    return ze + w * zo


def irfft_pow2_pallas(X: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inverse of :func:`rfft_pow2_pallas` to real length ``n``."""
    n = int(n)
    h = n // 2
    _check_row(h)
    if X.shape[-1] != h + 1:
        raise ValueError(f"irfft_pow2_pallas: expected {h + 1} bins, "
                         f"got {X.shape[-1]}")
    X = X.astype(jnp.complex64)
    # Discard imag of the DC and Nyquist bins (np.fft.irfft / planner
    # semantics): round-off there must not leak into the real output.
    edge = jnp.zeros((h + 1,), jnp.float32).at[0].set(1.0).at[h].set(1.0)
    X = X - 1j * (edge * jnp.imag(X))
    xrev = jnp.conj(X[..., ::-1])
    ze = 0.5 * (X + xrev)
    zo = 0.5 * (X - xrev) * jnp.asarray(_half_twiddle(n, +1.0))
    z = (ze + 1j * zo)[..., :h]
    yr, yi = fft_pow2_pallas_planar(jnp.real(z), jnp.imag(z), +1.0)
    out = jnp.stack([yr, yi], axis=-1).reshape(X.shape[:-1] + (n,))
    return out * (1.0 / h)


def fft_large_pow2_pallas(x: jnp.ndarray, sign: float = -1.0,
                          row: int = 1 << 18) -> jnp.ndarray:
    """Single long pow2 FFT (e.g. the 2^24 band) via one XLA-level
    four-step whose row transforms are the VMEM kernel.

    ``n = A·B`` with ``B = row``: the A-point column FFT is ONE complex
    matmul (A ≤ 128 on the MXU), the twiddle is fused elementwise
    (on-device phases — large literals are relay-fatal, see ops/fft.py),
    the B-point row FFTs run in VMEM, and the final transpose is the
    only extra HBM pass.
    """
    x = jnp.asarray(x)
    if not jnp.iscomplexobj(x):
        x = x.astype(jnp.complex64)
    n = int(x.shape[-1])
    if n & (n - 1):
        raise ValueError(f"fft_large_pow2_pallas: n={n} not a power of 2")
    if n <= MAX_ROW:
        y = fft_pow2_pallas(x, sign)
        return y
    row = max(row, n // LANES)          # keep A = n/row within the MXU
    a, b = n // row, row
    if a < 2 or a > LANES or b > MAX_ROW:
        raise ValueError(f"fft_large_pow2_pallas: unsupported n={n}")
    return _four_step_pallas(x, a, b, sign)


def mixed_split(n: int) -> Tuple[int, int] | None:
    """``n = a·b`` with pow2 ``b`` in kernel range and ``a ≤ 128``
    (``a`` may be non-pow2 — e.g. 24M = 48·2^19, the 96-station band).
    Returns the smallest valid ``a``, or None."""
    n = int(n)
    # Scan b from 2^18 down (NOT MAX_ROW): 2^18 rows are the soaked
    # configuration (FFT_SOAK_r04) and the same row size the pow2
    # four-step uses; a 2^19-row variant failed remote compile on the
    # v5e (smoke_r5w2). The column DFT grows to a ≤ 128 accordingly.
    b = 1 << 18
    while b >= MIN_ROW:
        if n % b == 0:
            a = n // b
            if 2 <= a <= LANES:
                return a, b
        b >>= 1
    return None


def fft_large_mixed_pallas(x: jnp.ndarray, sign: float = -1.0) -> jnp.ndarray:
    """Long FFT of size ``a·2^k`` (``a ≤ 128``, possibly non-pow2) via
    the four-step form: dense a-point column DFT on the MXU + pow2 VMEM
    kernel rows. Covers the non-pow2 band sizes the planner's native
    path handles badly (96 stations → 24M = 48·2^19; the native XLA
    lowering measured 25.2 ms vs 19.5 ms for the LARGER 32M pow2 band,
    BENCH_96_r04.json — VERDICT r4 weak #5)."""
    x = jnp.asarray(x)
    if not jnp.iscomplexobj(x):
        x = x.astype(jnp.complex64)
    n = int(x.shape[-1])
    if n <= MAX_ROW and not (n & (n - 1)):
        return fft_pow2_pallas(x, sign)
    split = mixed_split(n)
    if split is None:
        raise ValueError(f"fft_large_mixed_pallas: no a·pow2 split "
                         f"with a<=128 for n={n}")
    a, b = split
    return _four_step_pallas(x, a, b, sign)


def _four_step_pallas(x: jnp.ndarray, a: int, b: int,
                      sign: float) -> jnp.ndarray:
    n = a * b
    lead = x.shape[:-1]
    v = x.reshape(lead + (a, b))
    dr, di = _dft_planes(a, sign)
    # Planar XLA-level column FFT (4 real MXU matmuls at HIGHEST — a
    # complex dot would work too, but the explicit form avoids any
    # exotic complex-dot lowering on the relay backend).
    gr, gi = _cmm_nd(jnp.asarray(dr), jnp.asarray(di),
                     jnp.real(v), jnp.imag(v))
    p = jax.lax.broadcasted_iota(jnp.float32, (a, b), 0)
    q = jax.lax.broadcasted_iota(jnp.float32, (a, b), 1)
    ang = jnp.float32(sign * 2.0 * np.pi / n) * (p * q)
    wr, wi = jnp.cos(ang), jnp.sin(ang)
    tr = gr * wr - gi * wi
    ti = gr * wi + gi * wr
    rr, ri = fft_pow2_pallas_planar(tr, ti, sign)
    r = jax.lax.complex(rr, ri)                   # (..., a, b), rows done
    return jnp.swapaxes(r, -1, -2).reshape(lead + (n,))


def _cmm_nd(dr, di, xr, xi):
    """XLA-level complex contraction of x's axis -2 (leading dims OK).

    Runs OUTSIDE Mosaic, so ``lax.Precision.HIGH`` (3-pass bf16) is
    legal here and matches the in-kernel 3pass default's accuracy class.
    """
    hi = (jax.lax.Precision.HIGH if _mm_mode() == "3pass"
          else _MM_PRECISION)

    def mm(m, x):
        nbatch = x.ndim - 2
        out = jax.lax.dot_general(m, x, (((1,), (nbatch,)), ((), ())),
                                  precision=hi,
                                  preferred_element_type=jnp.float32)
        return jnp.moveaxis(out, 0, -2) if nbatch else out

    return mm(dr, xr) - mm(di, xi), mm(dr, xi) + mm(di, xr)
