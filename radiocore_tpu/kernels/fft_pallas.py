"""Whole-row pow2 FFT in VMEM: DFT matmuls on the MXU (Pallas).

Motivation (measured, BENCH_r02/fft_micro): XLA TPU's FFT custom call
runs large batched transforms at ~15-30× their HBM-traffic floor — the
extraction stage's 64×262144 batched IFFT and the 2^24 band FFT are
the fused pipeline's two dominant costs. A length-2^18 c64 row is only
2 MB, so the ENTIRE transform fits in VMEM: one HBM read + one HBM
write (the literal roofline) with all butterfly passes on-chip.

Formulation — recursive four-step with matmul butterflies:
``L = A·B`` viewed as ``x[a·B + b]``;

    X[p + A·q] = FFT_B over b of ( FFT_A over a of x  ·  W[p, b] ),
    W[p, b] = exp(sign·2πi·p·b/L)

* FFT over the *a*-axis is a LEFT-multiply by the A×A DFT matrix — an
  MXU matmul, no transpose needed.
* The recursion bottoms out at ``F ≤ 128``: a RIGHT-multiply by the
  F×F DFT matrix (contraction = 128 lanes = full MXU).
* Twiddles are computed in-kernel (broadcasted_iota → cos/sin): ``p·b``
  < L ≤ 2^19 is exact in f32, so phase error is ~2πε independent of L
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
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiocore_tpu.runtime.platform import has_tpu

LANES = 128
MAX_ROW = 1 << 19       # VMEM budget: 2 planes × 2 MB in/out + temps
MIN_ROW = 256


def _split(length: int) -> int:
    """A for one four-step level; B = length // A recurses (leaf ≤ 128)."""
    return LANES if length > LANES * LANES else length // LANES


def plan_sizes(length: int) -> List[int]:
    """Distinct DFT-matrix sizes a length-``length`` row FFT needs."""
    sizes = []
    l = length
    while l > LANES:
        a = _split(l)
        if a not in sizes:
            sizes.append(a)
        l //= a
    if l not in sizes:
        sizes.append(l)
    return sizes


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
import os
_CMUL = os.environ.get("RADIOCORE_TPU_FFT_CMUL", "4mm")


def _cmatmul(ar, ai, br, bi, contract_left: bool):
    """Complex matmul from planar f32 planes on the MXU.

    ``contract_left``: result = B @ X (B is the small DFT matrix, X has
    shape (..., A, B) — contract X's axis -2). Otherwise X @ B
    (contract X's axis -1). The DFT matrix is symmetric, so left/right
    use the same planes.
    """
    hi = jax.lax.Precision.HIGHEST

    def mm(m, x):
        if contract_left:
            # einsum('pa,...ab->...pb', m, x)
            nbatch = x.ndim - 2
            out = jax.lax.dot_general(
                m, x, (((1,), (nbatch,)), ((), ())),
                precision=hi, preferred_element_type=jnp.float32)
            # dot_general puts m's free axis first: (p, ..., b) → (..., p, b)
            return jnp.moveaxis(out, 0, -2) if nbatch else out
        return jax.lax.dot_general(
            x, m, (((x.ndim - 1,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32)

    if _CMUL == "3mm":
        # (br + i·bi)(ar + i·ai): m1 = br·ar, m2 = bi·ai,
        # m3 = (br+bi)(ar+ai); yr = m1 − m2, yi = m3 − m1 − m2.
        m1 = mm(br, ar)
        m2 = mm(bi, ai)
        m3 = mm(br + bi, ar + ai)
        return m1 - m2, m3 - m1 - m2

    if contract_left:
        yr = mm(br, ar) - mm(bi, ai)
        yi = mm(br, ai) + mm(bi, ar)
    else:
        yr = mm(br, ar) - mm(bi, ai)
        yi = mm(bi, ar) + mm(br, ai)
    return yr, yi


def _twiddle(a: int, b: int, length: int, sign: float):
    # Mosaic's tpu.iota only produces integers (hardware lowering rejects
    # a float iota even though interpret mode accepts it) — generate i32
    # and convert. p·q < L ≤ 2^19 stays exact in f32.
    p = jax.lax.broadcasted_iota(jnp.int32, (a, b), 0).astype(jnp.float32)
    q = jax.lax.broadcasted_iota(jnp.int32, (a, b), 1).astype(jnp.float32)
    ang = jnp.float32(sign * 2.0 * np.pi / length) * (p * q)
    return jnp.cos(ang), jnp.sin(ang)


def _fft_rows(xr, xi, dft, sign: float):
    """Unnormalized DFT over the last axis (in-VMEM values, planar)."""
    length = xr.shape[-1]
    if length <= LANES:
        dr, di = dft[length]
        return _cmatmul(xr, xi, dr, di, contract_left=False)
    a = _split(length)
    b = length // a
    lead = xr.shape[:-1]
    vr = xr.reshape(lead + (a, b))
    vi = xi.reshape(lead + (a, b))
    dr, di = dft[a]
    gr, gi = _cmatmul(vr, vi, dr, di, contract_left=True)
    wr, wi = _twiddle(a, b, length, sign)
    tr = gr * wr - gi * wi
    ti = gr * wi + gi * wr
    rr, ri = _fft_rows(tr, ti, dft, sign)        # over last axis (b)
    rr = jnp.swapaxes(rr, -1, -2).reshape(lead + (length,))
    ri = jnp.swapaxes(ri, -1, -2).reshape(lead + (length,))
    return rr, ri


def _fft_kernel(*refs, sizes, sign, a1, b1):
    xr_ref, xi_ref = refs[0], refs[1]
    dft = {}
    for k, s in enumerate(sizes):
        dft[s] = (refs[2 + 2 * k][...], refs[3 + 2 * k][...])
    or_ref, oi_ref = refs[-2], refs[-1]
    xr = xr_ref[...]                              # (g, a1, b1)
    xi = xi_ref[...]
    length = a1 * b1
    dr, di = dft[a1]
    gr, gi = _cmatmul(xr, xi, dr, di, contract_left=True)
    wr, wi = _twiddle(a1, b1, length, sign)
    tr = gr * wr - gi * wi
    ti = gr * wi + gi * wr
    rr, ri = _fft_rows(tr, ti, dft, sign)        # (g, a1, b1), FFT over b1
    or_ref[...] = jnp.swapaxes(rr, -1, -2)       # (g, b1, a1): k = p + a1·q
    oi_ref[...] = jnp.swapaxes(ri, -1, -2)


@functools.partial(jax.jit, static_argnames=("sign", "group"))
def _fft_call(xr: jnp.ndarray, xi: jnp.ndarray, sign: float, group: int):
    """xr/xi: (batch, A1, B1) f32 → (batch, B1, A1) planar DFT rows.

    ``group`` rows are processed per grid step (the wrapper targets
    ~2^18 elements of work per step and pads the batch to a multiple)
    so short transforms stay pipelined instead of dispatch-bound.
    """
    batch, a1, b1 = xr.shape
    length = a1 * b1
    sizes = tuple(plan_sizes(length))
    consts = []
    for s in sizes:
        dr, di = _dft_planes(s, sign)
        consts.extend([jnp.asarray(dr), jnp.asarray(di)])

    # FLOPs: 4 real matmuls per level; level contraction sizes = plan.
    contractions = []
    l = length
    while l > LANES:
        a = _split(l)
        contractions.append(a)
        l //= a
    contractions.append(l)
    flops = sum(8 * length * c for c in contractions) * batch
    bytes_acc = 4 * (4 * batch * length + sum(2 * s * s for s in sizes))
    trans = 2 * batch * length * max(len(contractions) - 1, 0)

    const_specs = [
        pl.BlockSpec(c.shape, functools.partial(lambda nd, *_: (0,) * nd,
                                                c.ndim),
                     memory_space=pltpu.VMEM) for c in consts
    ]
    row_spec = pl.BlockSpec((group, a1, b1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((group, b1, a1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fft_kernel, sizes=sizes, sign=sign,
                          a1=a1, b1=b1),
        grid=(batch // group,),
        in_specs=[row_spec, row_spec] + const_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((batch, b1, a1), jnp.float32),
                   jax.ShapeDtypeStruct((batch, b1, a1), jnp.float32)],
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_acc,
                                      transcendentals=trans),
        interpret=not has_tpu(),
    )(xr, xi, *consts)


def _check_row(length: int) -> Tuple[int, int]:
    if length & (length - 1) or not (MIN_ROW <= length <= MAX_ROW):
        raise ValueError(
            f"fft_pow2_pallas: row length {length} unsupported "
            f"(pow2 in [{MIN_ROW}, {MAX_ROW}])")
    a1 = _split(length)
    return a1, length // a1


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
    # Group short rows (~2^18 elements of work per grid step) so small
    # transforms stay pipelined instead of dispatch-bound. The group is
    # the largest DIVISOR of the batch at or under the target — padding
    # would cost a full extra HBM pass.
    target = min(max((1 << 18) // length, 1), batch)
    group = next(g for g in range(target, 0, -1) if batch % g == 0)
    yr, yi = _fft_call(xr3, xi3, float(sign), group)
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
    lead = x.shape[:-1]
    v = x.reshape(lead + (a, b))
    dr, di = _dft_planes(a, sign)
    # Planar XLA-level column FFT (4 real MXU matmuls at HIGHEST — a
    # complex dot would work too, but the explicit form avoids any
    # exotic complex-dot lowering on the relay backend).
    gr, gi = _cmatmul(jnp.real(v), jnp.imag(v), jnp.asarray(dr),
                      jnp.asarray(di), contract_left=True)
    p = jax.lax.broadcasted_iota(jnp.float32, (a, b), 0)
    q = jax.lax.broadcasted_iota(jnp.float32, (a, b), 1)
    ang = jnp.float32(sign * 2.0 * np.pi / n) * (p * q)
    wr, wi = jnp.cos(ang), jnp.sin(ang)
    tr = gr * wr - gi * wi
    ti = gr * wi + gi * wr
    rr, ri = fft_pow2_pallas_planar(tr, ti, sign)
    r = jax.lax.complex(rr, ri)                   # (..., a, b), rows done
    return jnp.swapaxes(r, -1, -2).reshape(lead + (n,))
