"""Host↔device transfer helpers with a complex-transfer fallback.

Some TPU runtime stacks (observed on the v5e relay used for this repo's
benchmarks) reject complex64 host↔device transfers with UNIMPLEMENTED
while on-device complex math — including FFTs — works fine. These
helpers probe that capability once and, when needed, move complex data
as stacked float32 planes, forming/splitting the complex value on the
device inside tiny jitted shims.

All IQ ingest and egress in the framework routes through here.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


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


def to_device_c64(x) -> jnp.ndarray:
    """Put ``x`` on device as complex64 (fallback: float planes + combine)."""
    if isinstance(x, jax.Array) and jnp.iscomplexobj(x):
        return x.astype(jnp.complex64)
    arr = np.asarray(x)
    if not np.iscomplexobj(arr):
        return jnp.asarray(arr, dtype=jnp.complex64)
    if complex_transfer_ok():
        return jnp.asarray(arr, dtype=jnp.complex64)
    planes = np.stack([arr.real.astype(np.float32),
                       arr.imag.astype(np.float32)])
    return _combine(jnp.asarray(planes))


def to_host(x) -> np.ndarray:
    """Fetch ``x`` to host numpy (fallback splits complex into planes)."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if jnp.iscomplexobj(x) and not complex_transfer_ok():
        re, im = _split(x)
        return np.asarray(re) + 1j * np.asarray(im).astype(np.complex64)
    return np.asarray(x)
