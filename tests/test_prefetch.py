"""Prefetch pipelining (data/prefetch.py): ordering, overlap, errors."""

import threading
import time

from tpudf.data.prefetch import prefetch


def test_order_preserved():
    assert list(prefetch(iter(range(100)))) == list(range(100))


def test_empty():
    assert list(prefetch(iter([]))) == []


def test_exception_propagates():
    def gen():
        yield 1
        raise ValueError("decode failed")

    it = prefetch(gen())
    assert next(it) == 1
    try:
        next(it)
    except ValueError as e:
        assert "decode failed" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_producer_overlaps_consumer():
    """With depth-2 prefetch, producer sleeps overlap consumer sleeps: the
    pipeline finishes in ~max(P, C), not P+C."""
    n, d = 6, 0.05

    def gen():
        for i in range(n):
            time.sleep(d)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(gen()):
        time.sleep(d)
    elapsed = time.perf_counter() - t0
    serial = 2 * n * d
    assert elapsed < serial * 0.8, f"no overlap: {elapsed:.3f}s vs {serial}"


def test_abandon_stops_producer():
    produced = []
    stop_seen = threading.Event()

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i
        stop_seen.set()

    it = prefetch(gen(), depth=2)
    next(it)
    it.close()  # abandon
    time.sleep(0.3)
    assert len(produced) < 100, "producer kept running after abandon"
    assert not stop_seen.is_set()
