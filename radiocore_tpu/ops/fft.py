"""FFT planning: native XLA FFT when the backend compiles it well,
four-step Cooley–Tukey decomposition when it doesn't.

Motivation (measured on TPU v5e via this repo's bench environment): XLA
TPU compiles most composite FFT sizes to fast native kernels, but some
sizes (e.g. 250 000 = 2⁴·5⁶ — the reference's canonical station rate,
reference: ``examples/receive_fm.py:12-21``) fall into a catastrophic
path that materializes the dense N×N DFT matrix (250 GB at f32) and
fails to compile, while neighbors (240 000, 100 000, 15 625) are fine.
Radio sample rates are full of such sizes, so the framework plans FFTs:

1. **probe** — AOT-compile a candidate native FFT for the exact size on
   the current backend once, cache the verdict (in-process + on-disk);
2. **decompose** — on failure, evaluate via the four-step algorithm:
   ``N = N1·N2``; reshape to (N1, N2); FFT the columns (length N1);
   multiply the (N1, N2) twiddle matrix ``W_N^{k1·j}``; FFT the rows
   (length N2); transpose-reshape. Sub-FFTs recurse through the same
   planner, so any smooth size works. This is also the classic
   transpose-based *distributed* FFT building block (SURVEY.md §2.5).

All functions operate along the last axis with arbitrary leading batch
dims, matching the rest of :mod:`radiocore_tpu.ops`.
"""

from __future__ import annotations

import functools
import json
import os
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# Sizes at or below this are assumed native-safe without probing (small
# DFT fallbacks are cheap even in the worst case).
_SMALL_NATIVE = 8192

_CACHE_LOCK = threading.Lock()
_NATIVE_OK: Dict[Tuple[str, int], bool] = {}
_policy = "auto"  # "auto" | "native" | "fourstep"

# Above this size, 'auto' prefers the four-step decomposition on
# accelerators even when the native FFT compiles: XLA's large single-FFT
# lowering falls off the HBM roofline superlinearly, while four-step is
# two batched small FFTs + twiddle + transposes (all well-tiled).
# Measured on v5e (benchmarks/fft_probe.py, c64, honest protocol):
#   2^22: native 8.02 ms / fourstep 5.95   2^23: 7.21 / 6.27
#   2^24: native 9.89 / fourstep 10.14     2^25: 29.40 / 18.92
# The threshold sits at the CLIFF (2^25; native scales superlinearly
# from there) rather than the first crossover: at 2^22–2^24 the two are
# within ~2 ms and native keeps the fused single-program pipeline at its
# best (24.7 vs 25.4 ms per bench.py step at 2^24). Override with
# RADIOCORE_TPU_FFT_FOURSTEP_MIN (0 disables).
_FOURSTEP_MIN_DEFAULT = 1 << 25


def _fourstep_min() -> int:
    raw = os.environ.get("RADIOCORE_TPU_FFT_FOURSTEP_MIN")
    if raw is None:
        return _FOURSTEP_MIN_DEFAULT
    v = int(float(raw))
    return v if v > 0 else (1 << 62)


def set_policy(policy: str) -> None:
    """Force FFT lowering: 'native', 'fourstep', or 'auto' (probe)."""
    global _policy
    if policy not in ("auto", "native", "fourstep"):
        raise ValueError(policy)
    _policy = policy
    _plan.cache_clear()


def _cache_path() -> str:
    base = os.environ.get("RADIOCORE_TPU_CACHE",
                          os.path.expanduser("~/.cache/radiocore_tpu"))
    return os.path.join(base, "fft_native_ok.json")


def _load_disk_cache() -> Dict[str, bool]:
    try:
        with open(_cache_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def _store_disk_cache(key: str, value: bool) -> None:
    try:
        path = _cache_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        cache = _load_disk_cache()
        cache[key] = value
        with open(path, "w") as f:
            json.dump(cache, f)
    except Exception:
        pass  # cache is best-effort


def _backend_name() -> str:
    try:
        return jax.devices()[0].platform
    except Exception:
        return "unknown"


def native_fft_ok(n: int) -> bool:
    """True when the current backend compiles a native length-n c64 FFT.

    Probes by AOT-compiling once; verdict cached in-process and on disk
    (keyed by backend). CPU always passes (pocketfft handles any size).
    """
    n = int(n)
    if n <= _SMALL_NATIVE:
        return True
    backend = _backend_name()
    if backend == "cpu":
        return True
    key = (backend, n)
    with _CACHE_LOCK:
        if key in _NATIVE_OK:
            return _NATIVE_OK[key]
        disk_key = f"{backend}:{n}"
        disk = _load_disk_cache()
        if disk_key in disk:
            _NATIVE_OK[key] = disk[disk_key]
            return disk[disk_key]
    try:
        shape = jax.ShapeDtypeStruct((n,), jnp.complex64)
        jax.jit(jnp.fft.fft).lower(shape).compile()
        ok = True
    except Exception:
        ok = False
    with _CACHE_LOCK:
        _NATIVE_OK[key] = ok
    _store_disk_cache(f"{backend}:{n}", ok)
    return ok


def _prime_factors(n: int) -> List[int]:
    out = []
    d = 2
    while d * d <= n:
        while n % d == 0:
            out.append(d)
            n //= d
        d += 1
    if n > 1:
        out.append(n)
    return out


def _split(n: int) -> Tuple[int, int]:
    """Split n = a·b with a ≤ b as balanced as the factorization allows."""
    factors = sorted(_prime_factors(n), reverse=True)
    a = 1
    for f in factors:
        if a * f <= int(np.sqrt(n)) + 1:
            a *= f
    if a == 1:  # all factors huge (near-prime): take the smallest factor
        a = factors[-1]
    return a, n // a


# Pow2 sizes at or above this route to the Pallas whole-row MXU FFT
# (kernels/fft_pallas.py) on accelerator backends: one HBM read+write
# per transform instead of XLA's multi-pass custom call (above MAX_ROW,
# one XLA-level four-step whose rows use the kernel). DEFAULT since r5:
# 2^24 — exactly the hardware-measured case (BENCH_bandkernel_r04.json:
# 20.15 vs 21.48 ms/step with the band FFT and nothing else rerouted;
# standalone FFT_SOAK_r04.json: 2^24 four-step 6.4 vs 9.7 ms native).
# Smaller sizes stay native pending their own A/Bs (the r4 global
# MIN=65536 flip also rerouted the demod's small transforms and wedged
# once — BENCH_allpallas_r04.json). Override via env; 0 disables.
_PALLAS_MIN_DEFAULT = 1 << 24


def _pallas_min() -> int:
    raw = os.environ.get("RADIOCORE_TPU_FFT_PALLAS_MIN")
    if raw is None:
        return _PALLAS_MIN_DEFAULT
    v = int(float(raw))
    return v if v > 0 else (1 << 62)


def _use_pallas(n: int) -> bool:
    if n & (n - 1) or n < _pallas_min():
        return False
    from radiocore_tpu.kernels import fft_pallas as _fp
    if n < _fp.MIN_ROW or n > _fp.MAX_ROW * _fp.LANES:
        return False
    from radiocore_tpu.runtime.platform import has_tpu
    return has_tpu()


# NON-pow2 sizes of the form a·2^k (a ≤ 128) at or above this route to
# the mixed-radix Pallas four-step (dense a-point column DFT + pow2 VMEM
# kernel rows) — the 96-station 24M band class where the native XLA
# lowering regresses. DEFAULT since r5: 2^23 — hardware A/B at 24M:
# mixed 12.8 ms vs fourstep 16.7 vs native 27.8 (FFT_PROBE_24M_r05.
# json), and the 96-station pipeline step dropped 41.9 → 27.8 ms
# (BENCH_96_r04 vs BENCH_96mixed_r05). Override via env; 0 disables.
_MIXED_MIN_DEFAULT = 1 << 23


def _mixed_min() -> int:
    raw = os.environ.get("RADIOCORE_TPU_FFT_MIXED_MIN")
    if raw is None:
        return _MIXED_MIN_DEFAULT
    v = int(float(raw))
    return v if v > 0 else (1 << 62)


def _use_mixed(n: int) -> bool:
    if not (n & (n - 1)) or n < _mixed_min():
        return False
    from radiocore_tpu.kernels import fft_pallas as _fp
    if _fp.mixed_split(n) is None:
        return False
    from radiocore_tpu.runtime.platform import has_tpu
    return has_tpu()


def _use_native(n: int) -> bool:
    if _policy == "native":
        return True
    if _policy == "fourstep":
        return n <= _SMALL_NATIVE
    if n >= _fourstep_min() and _backend_name() != "cpu":
        return False
    return native_fft_ok(n)


@functools.lru_cache(maxsize=256)
def _plan(n: int) -> Optional[Tuple[int, int]]:
    """None → native; (N1, N2) → four-step split (members planned recursively)."""
    if _use_native(n):
        return None
    n1, n2 = _split(n)
    if n1 == 1 or n2 == 1:
        raise ValueError(
            f"FFT size {n} is prime and unsupported natively on this "
            f"backend; choose a composite chunk size")
    return n1, n2


def _twiddles(n1: int, n2: int, sign: float) -> np.ndarray:
    k1 = np.arange(n1, dtype=np.float64)[:, None]
    j = np.arange(n2, dtype=np.float64)[None, :]
    return np.exp(sign * 2j * np.pi * k1 * j / (n1 * n2)).astype(np.complex64)


# Twiddle matrices above this element count are computed ON DEVICE at
# run time (iota → cos/sin, fused by XLA into the multiply — never
# materialized in HBM); smaller ones stay host-NumPy constants baked
# into the HLO (exact float64 phases). Large baked literals are doubly
# fatal through the TPU relay: a 2^25 split's 256 MB twiddle literal
# exceeded the compile-request limit (HTTP 413), and a closed-over
# device array is no escape — XLA constant-folds it into the HLO via a
# device→host fetch at lowering time. On-device precision is fine: the
# f32 outer product k1·j errs by ≤ ~ε·n, and the phase is 2π·(k1·j)/n,
# so the phase error is ≤ ~2πε ≈ 4e-7 rad independent of n.
_TWIDDLE_DEVICE_MIN = 1 << 20


def _apply_twiddle(z: jnp.ndarray, n1: int, n2: int,
                   sign: float) -> jnp.ndarray:
    if n1 * n2 < _TWIDDLE_DEVICE_MIN:
        return z * jnp.asarray(_twiddles(n1, n2, sign))
    k1 = jax.lax.iota(jnp.float32, n1)
    j = jax.lax.iota(jnp.float32, n2)
    ang = (sign * 2.0 * np.pi / (n1 * n2)) * (k1[:, None] * j[None, :])
    return z * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))


def _fft_rec(x: jnp.ndarray, sign: float) -> jnp.ndarray:
    """Unnormalized DFT (sign=-1 forward, +1 backward) along the last axis."""
    n = x.shape[-1]
    if _use_pallas(n):
        from radiocore_tpu.kernels import fft_pallas as _fp
        if n <= _fp.MAX_ROW:
            return _fp.fft_pow2_pallas(x, sign)
        return _fp.fft_large_pow2_pallas(x, sign)
    if _use_mixed(n):
        from radiocore_tpu.kernels import fft_pallas as _fp
        return _fp.fft_large_mixed_pallas(x, sign)
    plan = _plan(n)
    if plan is None:
        return jnp.fft.fft(x, axis=-1) if sign < 0 else (
            jnp.fft.ifft(x, axis=-1) * n)
    n1, n2 = plan
    lead = x.shape[:-1]
    a = x.reshape(lead + (n1, n2))
    # Length-n1 FFT along the column axis: move it last for the recursion.
    z = _fft_rec(jnp.moveaxis(a, -2, -1), sign)          # (..., n2, n1)
    z = jnp.moveaxis(z, -1, -2)                          # (..., n1, n2)
    z = _apply_twiddle(z, n1, n2, sign)
    xm = _fft_rec(z, sign)                               # (..., n1, n2) rows
    # Output index k = k1 + n1·k2 → transpose so k2 is the outer axis.
    return jnp.swapaxes(xm, -1, -2).reshape(lead + (n,))


def fft(x: jnp.ndarray) -> jnp.ndarray:
    """Forward FFT along the last axis (planned)."""
    x = jnp.asarray(x)
    if not jnp.iscomplexobj(x):
        x = x.astype(jnp.complex64)
    return _fft_rec(x, -1.0)


def fft_decomposed(x: jnp.ndarray, sign: float = -1.0) -> jnp.ndarray:
    """One four-step level with planner-recursive sub-FFTs, REGARDLESS
    of the policy/threshold (unnormalized; sign=-1 forward).

    Escape hatch for cases where the planner would choose native but the
    decomposition is measurably faster (e.g. large batched per-station
    IFFTs inside the extraction stage — the four-step form is two
    batched small native FFTs + a fused on-the-fly twiddle instead of
    one custom-call pass over a long axis)."""
    x = jnp.asarray(x)
    if not jnp.iscomplexobj(x):
        x = x.astype(jnp.complex64)
    n = x.shape[-1]
    n1, n2 = _split(n)
    if n1 == 1 or n2 == 1:
        return _fft_rec(x, sign)
    lead = x.shape[:-1]
    a = x.reshape(lead + (n1, n2))
    z = _fft_rec(jnp.moveaxis(a, -2, -1), sign)          # (..., n2, n1)
    z = jnp.moveaxis(z, -1, -2)
    z = _apply_twiddle(z, n1, n2, sign)
    xm = _fft_rec(z, sign)
    return jnp.swapaxes(xm, -1, -2).reshape(lead + (n,))


def ifft_decomposed(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse counterpart of :func:`fft_decomposed` (normalized)."""
    return fft_decomposed(x, +1.0) / x.shape[-1]


def ifft(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse FFT along the last axis (planned, normalized)."""
    x = jnp.asarray(x)
    return _fft_rec(x, +1.0) / x.shape[-1]


def rfft(x: jnp.ndarray) -> jnp.ndarray:
    """Real-input FFT along the last axis → n//2+1 bins (planned).

    Native path uses the backend's rfft; the decomposed path computes the
    full complex FFT and slices (correct for any size; only engaged where
    the native kernel is unusable anyway).
    """
    n = x.shape[-1]
    if _use_pallas(n):
        from radiocore_tpu.kernels import fft_pallas as _fp
        if _fp.MIN_ROW <= n // 2 <= _fp.MAX_ROW:
            return _fp.rfft_pow2_pallas(x)
    if _plan(n) is None:
        return jnp.fft.rfft(x, axis=-1)
    return fft(x)[..., :n // 2 + 1]


def irfft(X: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inverse real FFT along the last axis to length ``n`` (planned)."""
    X = jnp.asarray(X)
    n = int(n)
    if _use_pallas(n) and X.shape[-1] == n // 2 + 1:
        from radiocore_tpu.kernels import fft_pallas as _fp
        if _fp.MIN_ROW <= n // 2 <= _fp.MAX_ROW:
            return _fp.irfft_pow2_pallas(X, n)
    if _plan(n) is None:
        return jnp.fft.irfft(X, n=n, axis=-1)
    # Rebuild the Hermitian spectrum; clamp DC/Nyquist imag parts like irfft.
    m = X.shape[-1]
    need = n // 2 + 1
    if m < need:
        pad = [(0, 0)] * (X.ndim - 1) + [(0, need - m)]
        X = jnp.pad(X, pad)
    else:
        X = X[..., :need]
    X = X.at[..., 0].set(jnp.real(X[..., 0]).astype(X.dtype))
    if n % 2 == 0:
        X = X.at[..., -1].set(jnp.real(X[..., -1]).astype(X.dtype))
        mid = X[..., 1:-1]
    else:
        mid = X[..., 1:]
    full = jnp.concatenate([X, jnp.conj(mid[..., ::-1])], axis=-1)
    return jnp.real(ifft(full))
