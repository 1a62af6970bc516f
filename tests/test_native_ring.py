"""Native C++ ring backend: parity with the Python backend + SPSC stress."""

import threading

import numpy as np
import pytest

from radiocore_tpu.native import native_available
from radiocore_tpu.tools.ringbuffer import RingBuffer

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


def test_backend_selected():
    assert RingBuffer(16, dtype="float32").backend == "native"
    assert RingBuffer(16, dtype="float32", backend="python").backend == "python"


@pytest.mark.parametrize("backend", ["python", "native"])
def test_fifo_wraparound_parity(backend):
    ring = RingBuffer(8, dtype="float32", backend=backend,
                      print_overflow=False)
    ring.put(np.arange(6, dtype=np.float32))
    out = np.zeros(6, np.float32)
    assert ring.get(out) is True
    ring.put(np.arange(10, 16, dtype=np.float32))  # wraps
    out = np.zeros(6, np.float32)
    assert ring.get(out) is True
    np.testing.assert_array_equal(out, np.arange(10, 16))
    assert ring.occupancy == 0


def test_native_overflow_reset():
    ring = RingBuffer(8, dtype="float32", backend="native",
                      print_overflow=False)
    ring.put(np.zeros(8, np.float32))
    ring.put(np.ones(4, np.float32))  # overflow → reset → put
    assert ring.occupancy == 4
    out = np.zeros(4, np.float32)
    ring.get(out)
    np.testing.assert_array_equal(out, np.ones(4))


def test_native_complex64():
    ring = RingBuffer(16, dtype="complex64", backend="native")
    data = (np.arange(8) + 1j * np.arange(8)).astype(np.complex64)
    ring.put(data)
    out = np.zeros(8, np.complex64)
    assert ring.get(out) is True
    np.testing.assert_array_equal(out, data)


def test_native_spsc_stress():
    """Producer/consumer threads: every sample arrives in order."""
    n_chunks, chunk = 200, 512
    ring = RingBuffer(chunk * 8, dtype="float32", backend="native",
                      print_overflow=False)
    src = np.arange(n_chunks * chunk, dtype=np.float32)
    received = np.empty_like(src)

    def producer():
        for i in range(n_chunks):
            while ring.vacancy < chunk:
                pass  # back-pressure: SPSC, no overflow allowed in the test
            ring.put(src[i * chunk:(i + 1) * chunk])

    thread = threading.Thread(target=producer)
    thread.start()
    buf = np.zeros(chunk, np.float32)
    for i in range(n_chunks):
        assert ring.get(buf, timeout=5.0) is True
        received[i * chunk:(i + 1) * chunk] = buf
    thread.join(timeout=5)
    np.testing.assert_array_equal(received, src)
