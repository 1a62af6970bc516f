"""Batched channel extraction from a full-band spectrum.

Core of the Tuner / fused pipeline: for channel c with spectrum roll
``s_c``, scipy's ``resample(roll(X, s_c)·W, m, domain='freq')`` keeps the
bins around DC of the rolled spectrum — which form ONE contiguous
(wrapping) run of the *unrolled* spectrum. So extraction needs no
large gather: each channel is a static contiguous slice of
``concat([X, X[:run]])``, reordered and windowed, followed by one batched
IFFT. Static slices compile to plain HBM reads (the gather formulation
pays scattered-access cost on TPU).

Shift/window/Nyquist-fold semantics exactly match
``resample_spectrum(roll(X, s)·W, m)`` — asserted by tests.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from radiocore_tpu.ops import design
from radiocore_tpu.ops import fft as _fft


def extraction_plan(n: int, shifts: Sequence[int], bandwidth: int):
    """Host-side constants: slice starts, window vector, fix weight."""
    m = int(bandwidth)
    m2 = m // 2 + 1
    win = np.fft.fftshift(design.window("hann", n))

    neg = m - m2                       # number of negative-frequency bins
    run = m + (1 if m % 2 == 0 else 0)  # extra leading fix bin when even
    # Rolled-bin positions covered by the run, in slice order.
    if m % 2 == 0:
        rolled = np.concatenate([[n - m // 2],
                                 np.arange(n - neg, n), np.arange(m2)])
    else:
        rolled = np.concatenate([np.arange(n - neg, n), np.arange(m2)])
    starts = [int((rolled[0] - s) % n) for s in shifts]

    # Window sampled at rolled positions, in OUTPUT order [pos, neg].
    w_out = np.concatenate([win[:m2], win[n - neg:]]).astype(np.float32)
    w_fix = np.float32(win[n - m // 2]) if m % 2 == 0 else None
    return starts, w_out, w_fix, m2, run


def uniform_extraction_start(n: int, shifts: Sequence[int],
                             bandwidth: int):
    """First slice start ``a0`` when the plan tiles the band uniformly
    with spacing == bandwidth (the fused-kernel layout), else None."""
    m = int(bandwidth)
    c = len(shifts)
    starts, _w, _f, _m2, _run = extraction_plan(n, shifts, m)
    uniform = (c > 1 and n >= c * m
               and all((starts[i] - starts[0]) % n == (i * m) % n
                       for i in range(c)))
    return starts[0] if uniform else None


@functools.lru_cache(maxsize=32)
def make_extractor(n: int, shifts: Tuple[int, ...],
                   bandwidth: int) -> Callable:
    """Jit-compatible ``spectrum (n,) → channels (C, bandwidth)`` fn.

    Two lowerings: when the channel plan tiles the band uniformly with
    spacing == bandwidth (the critical multi-FM layout), ALL channels'
    runs are one rolled spectrum reshaped ``(C, m)`` — two static slices
    and a reshape. Otherwise, one static slice per channel.
    """
    m = int(bandwidth)
    c = len(shifts)
    starts, w_out, w_fix, m2, run = extraction_plan(n, shifts, m)
    neg = m - m2
    s_fac = n / m
    # Keep the window as host NumPy: an eagerly-created device array
    # becomes a captured jit constant whose lowering needs a D2H fetch —
    # which the flaky relay can reject at compile time. XLA embeds a
    # NumPy constant directly.
    w_j = w_out

    uniform = (c > 1 and n >= c * m
               and all((starts[i] - starts[0]) % n == (i * m) % n
                       for i in range(c)))

    # Batched per-channel IFFT lowering: 'native' (one custom-call pass
    # over the m axis), 'fourstep' (two batched small native FFTs +
    # fused twiddle — ops.fft.ifft_decomposed), 'pallas' (whole-row
    # VMEM kernel, kernels/fft_pallas.py — one HBM read+write),
    # 'fused' (slice+window+Nyquist-fix+IFFT in ONE kernel pass,
    # kernels/extract_pallas.py — skips the XLA reorder entirely), or
    # 'auto': the fused kernel ON TPU when the plan qualifies (r4
    # hardware A/B: extraction 13.9 → 7.8 ms, pipeline step 24.7 →
    # 20.6 ms at 64×262144 — EXTRACT_PROFILE_r04.json /
    # BENCH_fused_r04.json; golden-parity tests pin the math), else the
    # native custom call. Set RADIOCORE_TPU_EXTRACT_IFFT=native to opt
    # out.
    import os
    _impl = os.environ.get("RADIOCORE_TPU_EXTRACT_IFFT", "auto")

    def _pallas_ok() -> bool:
        # Explicit opt-in is honored on any backend (the kernel runs in
        # interpret mode off-TPU — slow but correct, which is what the
        # CPU parity tests exercise); only the size must qualify.
        from radiocore_tpu.kernels.fft_pallas import MAX_ROW, MIN_ROW
        return (m & (m - 1)) == 0 and MIN_ROW <= m <= MAX_ROW

    def finish(y_all: jnp.ndarray) -> jnp.ndarray:
        if _impl == "pallas" and _pallas_ok():
            from radiocore_tpu.kernels.fft_pallas import fft_pow2_pallas
            # Unnormalized backward DFT; fold 1/(s_fac·m) into the input
            # scale. No optimization_barrier here: the kernel pins its
            # own operand layouts, and the barrier would force an extra
            # interleaved-c64 HBM materialization between the reorder
            # and the kernel's planar split (one whole read+write pass
            # of the (C, m) array).
            return fft_pow2_pallas(y_all / (s_fac * m), sign=+1.0)
        # Barrier pins a canonical layout: without it the SPMD partitioner
        # may hand the CPU FFT runtime a non-dim0-major layout (RET_CHECK).
        y_all = jax.lax.optimization_barrier(y_all)
        if _impl == "fourstep":
            return _fft.ifft_decomposed(y_all / s_fac)
        return _fft.ifft(y_all / s_fac)

    def _fused_ok(spectrum: jnp.ndarray) -> bool:
        if m % 2 or spectrum.ndim != 1:
            return False
        if _impl == "auto":
            # TPU default since r4 (the A/B evidence above). CPU stays
            # native: the kernel's interpret mode is orders slower and
            # parity is already pinned by the explicit opt-in tests.
            from radiocore_tpu.runtime.platform import has_tpu
            if not has_tpu():
                return False
        elif _impl != "fused":
            return False
        from radiocore_tpu.kernels.extract_pallas import extract_ok
        return extract_ok(n, m, c)

    def extract_uniform(spectrum: jnp.ndarray) -> jnp.ndarray:
        a0 = starts[0]
        if _fused_ok(spectrum):
            from radiocore_tpu.kernels.extract_pallas import \
                extract_rows_pallas
            return extract_rows_pallas(spectrum, a0, c, m,
                                       1.0 / (s_fac * m))
        need = c * m + 1
        base = jnp.concatenate(
            [spectrum[..., a0:], spectrum[..., :a0],
             spectrum[..., a0:a0 + 1]], axis=-1)[..., :need]
        rows = base[..., :c * m].reshape(spectrum.shape[:-1] + (c, m))
        # Element ``m`` of each run is the next row's first element.
        nxt = jnp.concatenate([rows[..., 1:, :1], base[..., None, -1:]],
                              axis=-2)                     # (..., C, 1)
        if m % 2 == 0:
            pos = jnp.concatenate([rows[..., m // 2:], nxt], axis=-1)
            y = jnp.concatenate([pos, rows[..., 1:m // 2]], axis=-1) * w_j
            y = y.at[..., m2 - 1].add(rows[..., 0] * w_fix)
        else:
            pos = jnp.concatenate([rows[..., neg:], nxt], axis=-1)[..., :m2]
            y = jnp.concatenate([pos, rows[..., :neg]], axis=-1) * w_j
        return finish(y)

    def extract_slices(spectrum: jnp.ndarray) -> jnp.ndarray:
        ext = jnp.concatenate([spectrum, spectrum[..., :run]], axis=-1)
        rows = []
        for a0 in starts:
            sl = ext[..., a0:a0 + run]
            if m % 2 == 0:
                y = jnp.concatenate([sl[..., m // 2:], sl[..., 1:m // 2]],
                                    axis=-1) * w_j
                y = y.at[..., m2 - 1].add(sl[..., 0] * w_fix)
            else:
                y = jnp.concatenate([sl[..., neg:], sl[..., :neg]],
                                    axis=-1) * w_j
            rows.append(y)
        return finish(jnp.stack(rows, axis=-2))

    return extract_uniform if uniform else extract_slices
