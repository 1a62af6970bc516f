"""Native (C++) runtime components, loaded via ctypes.

Builds ``ringbuffer.cpp`` / ``iqconvert.cpp`` on demand with the system
C++ compiler into a per-user cache directory; all consumers degrade
gracefully to the pure Python implementations when no toolchain is
available.
"""

from radiocore_tpu.native.build import (iq_convert_native,
                                        iq_native_available,
                                        load_native_ring, native_available)

__all__ = ["iq_convert_native", "iq_native_available", "load_native_ring",
           "native_available"]
