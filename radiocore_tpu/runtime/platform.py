"""Platform probing and distributed runtime setup.

TPU analog of the reference's CUDA capability probe
(reference: ``radiocore/__init__.py:6-26`` ``HasCuda``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax


@functools.lru_cache(maxsize=None)
def has_tpu() -> bool:
    """Return True when a TPU device is available.

    Mirrors the reference's ``HasCuda()`` probe semantics
    (reference: ``radiocore/__init__.py:6-26``): a cheap, cached capability
    check apps can use to pick configurations. Never raises.
    """
    try:
        return any("tpu" in d.device_kind.lower() or d.platform == "tpu"
                   for d in jax.devices())
    except Exception:  # no backend at all
        return False


def HasTpu() -> bool:  # noqa: N802 - parity alias with reference HasCuda()
    """Alias of :func:`has_tpu` matching the reference's naming style."""
    return has_tpu()


def HasCuda() -> bool:  # noqa: N802 - drop-in migration shim
    """Migration shim for code written against the reference API: answers
    "is an accelerator available?" — here that means a TPU
    (reference: ``radiocore/__init__.py:6-26``)."""
    return has_tpu()


def platform_summary() -> dict:
    """Return a structured summary of the visible JAX platform/devices."""
    devs = jax.devices()
    return {
        "platform": devs[0].platform if devs else "none",
        "device_kind": devs[0].device_kind if devs else "none",
        "n_devices": len(devs),
        "n_local_devices": jax.local_device_count(),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "has_tpu": has_tpu(),
    }


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize the JAX multi-host (DCN) runtime.

    The reference has no multi-process runtime at all — its only
    inter-process transport is ZeroMQ PUB/SUB
    (reference: ``examples/multi_fm_server.py:116-120``). On TPU pods the
    idiomatic equivalent is ``jax.distributed.initialize`` so collectives
    ride ICI/DCN inside jit.

    No-op when JAX is already initialized or when running single-process
    with no coordinator configured.
    """
    # NOTE: must not touch the backend (jax.devices/process_count) before
    # jax.distributed.initialize — backend init would pin a single-process
    # world. is_initialized() is a pure runtime-state check.
    if jax.distributed.is_initialized():
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if kwargs:
        jax.distributed.initialize(**kwargs)
