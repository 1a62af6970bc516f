"""On-demand compilation + ctypes binding of the native ring buffer."""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import tempfile
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "ringbuffer.cpp")


def _lib_path() -> str:
    base = os.environ.get("RADIOCORE_TPU_CACHE",
                          os.path.expanduser("~/.cache/radiocore_tpu"))
    return os.path.join(base, "libradiocore_ring.so")


def _build() -> Optional[str]:
    path = _lib_path()
    if (os.path.exists(path)
            and os.path.getmtime(path) >= os.path.getmtime(_SRC)):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    for cxx in ("g++", "c++", "clang++"):
        try:
            # Build to a temp file then atomically rename so concurrent
            # processes never load a half-written .so.
            fd, tmp = tempfile.mkstemp(suffix=".so",
                                       dir=os.path.dirname(path))
            os.close(fd)
            subprocess.run(
                [cxx, "-O3", "-std=c++17", "-shared", "-fPIC",
                 _SRC, "-o", tmp],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, path)
            return path
        except (OSError, subprocess.SubprocessError):
            try:
                os.unlink(tmp)
            except OSError:
                pass
            continue
    return None


@functools.lru_cache(maxsize=1)
def _load() -> Optional[ctypes.CDLL]:
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.rc_ring_create.restype = ctypes.c_void_p
    lib.rc_ring_create.argtypes = [ctypes.c_size_t]
    lib.rc_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.rc_ring_capacity.restype = ctypes.c_size_t
    lib.rc_ring_capacity.argtypes = [ctypes.c_void_p]
    lib.rc_ring_occupancy.restype = ctypes.c_size_t
    lib.rc_ring_occupancy.argtypes = [ctypes.c_void_p]
    lib.rc_ring_reset.argtypes = [ctypes.c_void_p]
    lib.rc_ring_put.restype = ctypes.c_int
    lib.rc_ring_put.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_size_t]
    lib.rc_ring_get.restype = ctypes.c_int
    lib.rc_ring_get.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_size_t]
    return lib


def native_available() -> bool:
    """True when the native ring compiled and loaded on this machine."""
    return _load() is not None


class NativeRing:
    """ctypes handle to one C++ SPSC byte ring."""

    def __init__(self, capacity_bytes: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native ring unavailable (no C++ toolchain)")
        self._lib = lib
        self._handle = lib.rc_ring_create(capacity_bytes)
        if not self._handle:
            raise MemoryError("rc_ring_create failed")

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.rc_ring_destroy(self._handle)
                self._handle = None
        except Exception:
            pass

    @property
    def occupancy_bytes(self) -> int:
        return self._lib.rc_ring_occupancy(self._handle)

    def reset(self) -> None:
        self._lib.rc_ring_reset(self._handle)

    def put_bytes(self, buf) -> int:
        addr = ctypes.cast(
            (ctypes.c_char * len(buf)).from_buffer_copy(buf)
            if isinstance(buf, (bytes, bytearray)) else
            ctypes.c_void_p(buf.ctypes.data), ctypes.c_void_p)
        n = buf.nbytes if hasattr(buf, "nbytes") else len(buf)
        return self._lib.rc_ring_put(self._handle, addr, n)

    def get_bytes(self, out) -> int:
        addr = ctypes.c_void_p(out.ctypes.data)
        return self._lib.rc_ring_get(self._handle, addr, out.nbytes)


def load_native_ring(capacity_bytes: int) -> NativeRing:
    return NativeRing(capacity_bytes)
