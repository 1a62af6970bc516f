"""Host↔device transfer helpers resilient to flaky TPU relay stacks.

Some TPU runtime stacks (observed on the v5e relay used for this repo's
benchmarks) reject host↔device transfers with transient UNIMPLEMENTED
errors. Two distinct failure modes exist:

* complex64 transfers failing while float32 works — probed once by
  :func:`complex_transfer_ok`; fallback moves stacked float32 planes and
  forms the complex value on device inside a tiny jitted shim;
* SIZE-dependent transient failures: a small probe succeeds but a
  multi-hundred-kB put/get fails. Handled at call time with retries and,
  as a last resort, chunked staging (≤64 Ki-element pieces concatenated
  on device / fetched per-slice).

All IQ ingest and egress in the framework routes through here. The
reference has no equivalent (its device boundary is CuPy's
``asarray``/``asnumpy``, reference ``radiocore/analog/fm.py:60,69-70``);
this is runtime infrastructure the relay transport makes necessary.
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# Elements per staged transfer piece. The relay reliably moves ~64 Ki
# elements; pieces concatenate on device.
_CHUNK_ELEMS = 1 << 16
# Relay wedges last seconds-to-tens-of-seconds and then clear (measured:
# a wedged D2H blocked 14 s and succeeded); be patient before chunking.
_ATTEMPTS = 5
_RETRY_DELAY_S = 0.5


@functools.lru_cache(maxsize=1)
def complex_transfer_ok() -> bool:
    """True when complex64 arrays can round-trip host↔device directly."""
    try:
        probe = jnp.asarray(np.zeros(8, np.complex64))
        jax.block_until_ready(probe)
        np.asarray(probe)
        return True
    except Exception:
        return False


@jax.jit
def _combine(planes: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.complex(planes[0], planes[1])


@jax.jit
def _split(x: jnp.ndarray):
    return jnp.real(x), jnp.imag(x)


def _put_retry(arr: np.ndarray) -> jnp.ndarray:
    """Device-put with retries; raises the last error after _ATTEMPTS."""
    for attempt in range(_ATTEMPTS):
        try:
            out = jnp.asarray(arr)
            jax.block_until_ready(out)
            return out
        except Exception:
            if attempt == _ATTEMPTS - 1:
                raise
            time.sleep(_RETRY_DELAY_S * (2 ** attempt))


def _put_chunked(arr: np.ndarray) -> jnp.ndarray:
    """Stage a host array to device in relay-safe pieces."""
    flat = np.ascontiguousarray(arr).reshape(-1)
    if flat.size <= _CHUNK_ELEMS:
        return _put_retry(flat).reshape(arr.shape)
    parts = [_put_retry(flat[i:i + _CHUNK_ELEMS])
             for i in range(0, flat.size, _CHUNK_ELEMS)]
    return jnp.concatenate(parts).reshape(arr.shape)


def _put_resilient(arr: np.ndarray) -> jnp.ndarray:
    """Direct put → retry → chunked staging."""
    try:
        out = jnp.asarray(arr)
        jax.block_until_ready(out)
        return out
    except Exception:
        return _put_chunked(arr)


def to_device_c64(x) -> jnp.ndarray:
    """Put ``x`` on device as complex64 (plane/chunked fallbacks)."""
    if isinstance(x, jax.Array) and jnp.iscomplexobj(x):
        return x.astype(jnp.complex64)
    arr = np.asarray(x)
    if not np.iscomplexobj(arr):
        return _put_resilient(arr.astype(np.float32)).astype(jnp.complex64)
    if complex_transfer_ok():
        try:
            out = jnp.asarray(arr, dtype=jnp.complex64)
            jax.block_until_ready(out)
            return out
        except Exception:
            pass  # fall through to the plane path
    planes = np.stack([arr.real.astype(np.float32),
                       arr.imag.astype(np.float32)])
    return _combine(_put_resilient(planes))


def to_device_f32(x) -> jnp.ndarray:
    """Put a real array on device as float32 with the same resilience."""
    if isinstance(x, jax.Array):
        return x.astype(jnp.float32)
    return _put_resilient(np.asarray(x, dtype=np.float32))


def _fetch_retry(x: jax.Array, attempts: int = _ATTEMPTS) -> np.ndarray:
    for attempt in range(attempts):
        try:
            return np.asarray(x)
        except Exception:
            if attempt == attempts - 1:
                raise
            time.sleep(min(_RETRY_DELAY_S * (2 ** attempt), 5.0))


def _fetch_chunked(x: jax.Array) -> np.ndarray:
    """Fetch a device array in relay-safe pieces (flattened on device)."""
    flat = jnp.reshape(x, (-1,))
    n = flat.shape[0]
    if n <= _CHUNK_ELEMS:
        return _fetch_retry(flat).reshape(np.shape(x))
    parts = [_fetch_retry(jax.lax.slice(flat, (i,),
                                        (min(i + _CHUNK_ELEMS, n),)))
             for i in range(0, n, _CHUNK_ELEMS)]
    return np.concatenate(parts).reshape(np.shape(x))


def to_host(x) -> np.ndarray:
    """Fetch ``x`` to host numpy (plane/chunked fallbacks).

    Scalars/small arrays get a PATIENT retry (~2 min total): the relay's
    D2H failure windows last minutes and oscillate; benchmark barriers
    and metrics fetch scalars, where waiting out the window beats dying.
    """
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if np.size(x) <= 16 and (not jnp.iscomplexobj(x)
                             or complex_transfer_ok()):
        # Default ~2.3 min of patience; benchmarks override via env —
        # measured bad D2H windows last 35+ min (CLAUDE.md), so a
        # bench barrier needs RADIOCORE_TPU_FETCH_ATTEMPTS≈500 (~42 min)
        # to ride one out instead of dying.
        attempts = int(os.environ.get("RADIOCORE_TPU_FETCH_ATTEMPTS", 30))
        return _fetch_retry(x, attempts=attempts)
    if jnp.iscomplexobj(x) and not complex_transfer_ok():
        re, im = _split(x)
        return (to_host(re) + 1j * to_host(im)).astype(np.complex64)
    try:
        return np.asarray(x)
    except Exception:
        if jnp.iscomplexobj(x):
            re, im = _split(x)
            return (_fetch_chunked(re)
                    + 1j * _fetch_chunked(im)).astype(np.complex64)
        return _fetch_chunked(x)
