"""Tools semantics tests, modeled on the reference's test coverage
(reference: tests/test_buffer.py, test_ringbuffer.py, test_carrousel.py)
plus the DSP-free behaviors SURVEY.md §4 calls out."""

import numpy as np
import pytest

from radiocore_tpu import Buffer, Carrousel, Chopper, RingBuffer


def test_buffer_consume_persists():
    buf = Buffer(16, dtype="float32")
    with buf.consume() as arr:
        arr[:4] = 1.5
    with buf.consume() as arr:
        assert np.all(arr[:4] == 1.5)
        assert np.all(arr[4:] == 0)


def test_buffer_device_consume_persists():
    # Device buffers stage through a host copy so the reference's
    # write-persistence contract holds despite jax.Array immutability
    # (reference: tests/test_buffer.py:8-30).
    buf = Buffer(16, dtype="float32", device=True)
    with buf.consume() as arr:
        arr[:4] = 1.5
    with buf.consume() as arr:
        assert np.all(arr[:4] == 1.5)
        assert np.all(arr[4:] == 0)
    assert np.all(np.asarray(buf.data)[:4] == 1.5)


def test_buffer_lock():
    buf = Buffer(8, lock=True)
    assert not buf.is_locked
    with buf.consume():
        assert buf.is_locked
    assert not buf.is_locked
    with pytest.raises(ValueError):
        Buffer(8).is_locked


def test_ringbuffer_fifo_and_accounting():
    ring = RingBuffer(8, dtype="float32", print_overflow=False)
    ring.put(np.arange(4, dtype=np.float32))
    assert ring.occupancy == 4 and ring.vacancy == 4
    out = np.zeros(4, np.float32)
    assert ring.get(out) is True
    np.testing.assert_array_equal(out, np.arange(4))
    assert ring.occupancy == 0


def test_ringbuffer_wraparound():
    ring = RingBuffer(8, dtype="float32", print_overflow=False)
    ring.put(np.arange(6, dtype=np.float32))
    out = np.zeros(6, np.float32)
    ring.get(out)
    ring.put(np.arange(10, 16, dtype=np.float32))  # wraps around the end
    out = np.zeros(6, np.float32)
    ring.get(out)
    np.testing.assert_array_equal(out, np.arange(10, 16))


def test_ringbuffer_overflow_resets():
    """Overflow hard-resets the ring before the write
    (reference semantics: occupancy 8 → 4 after an overflowing put)."""
    ring = RingBuffer(8, dtype="float32", print_overflow=False)
    ring.put(np.zeros(8, np.float32))
    assert ring.occupancy == 8
    ring.put(np.ones(4, np.float32))
    assert ring.occupancy == 4
    out = np.zeros(4, np.float32)
    ring.get(out)
    np.testing.assert_array_equal(out, np.ones(4))


def test_ringbuffer_get_timeout_returns_none():
    ring = RingBuffer(8, dtype="float32")
    out = np.zeros(4, np.float32)
    assert ring.get(out, timeout=0.05) is None


def test_ringbuffer_rejects_oversize():
    ring = RingBuffer(4, dtype="float32")
    with pytest.raises(ValueError):
        ring.put(np.zeros(5, np.float32))
    with pytest.raises(ValueError):
        ring.get(np.zeros(5, np.float32))


def test_ringbuffer_no_overflow_raises():
    ring = RingBuffer(4, dtype="float32", allow_overflow=False)
    ring.put(np.zeros(4, np.float32))
    with pytest.raises(ValueError):
        ring.put(np.zeros(1, np.float32))


def test_carrousel_cycles_slots():
    car = Carrousel([np.zeros(2) for _ in range(3)], print_overflow=False)
    assert car.capacity == 3 and car.is_empty
    with car.enqueue() as slot:
        slot[:] = 1
    with car.enqueue() as slot:
        slot[:] = 2
    assert car.occupancy == 2 and car.is_healthy
    with car.dequeue() as slot:
        assert slot[0] == 1
    with car.dequeue() as slot:
        assert slot[0] == 2
    assert car.is_empty
    with pytest.raises(ValueError):
        with car.dequeue():
            pass


def test_carrousel_overflow_advances_head():
    """After overflowing a full carrousel, the oldest item is dropped:
    first dequeue yields item 2, not item 1 (reference test_carrousel.py)."""
    car = Carrousel([np.zeros(1) for _ in range(3)], print_overflow=False)
    for v in (1, 2, 3):
        with car.enqueue() as slot:
            slot[:] = v
    assert car.is_full
    with car.enqueue() as slot:  # overflow: drops item 1
        slot[:] = 4
    assert car.overflow == 1
    with car.dequeue() as slot:
        assert slot[0] == 2


def test_carrousel_unwraps_buffer_items():
    items = [Buffer(4, dtype="float32") for _ in range(2)]
    car = Carrousel(items)
    with car.enqueue() as raw:
        assert isinstance(raw, np.ndarray)
        raw[:] = 7
    with car.dequeue() as raw:
        assert np.all(raw == 7)


def test_chopper():
    chop = Chopper(12, 4)
    arr = np.arange(12)
    chunks = list(chop.chop(arr))
    assert len(chunks) == 3
    np.testing.assert_array_equal(chunks[1], [4, 5, 6, 7])
    np.testing.assert_array_equal(chop.chop_batch(arr),
                                  arr.reshape(3, 4))
    with pytest.raises(ValueError):
        Chopper(10, 4)
    assert "youtube" in Chopper.get_to_da_choppa()
