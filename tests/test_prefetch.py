"""DevicePrefetcher: ordering, exception propagation, clean shutdown."""

import threading
import time

import pytest

from retinanet_tpu.data.prefetch import DevicePrefetcher


def test_yields_in_production_order():
    it = iter(range(50))
    pf = DevicePrefetcher(lambda: next(it), depth=4)
    assert [next(pf) for _ in range(50)] == list(range(50))
    with pytest.raises(StopIteration):
        next(pf)
    pf.close()


def test_exception_propagates_to_consumer():
    calls = {"n": 0}

    def make():
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("boom")
        return calls["n"]

    pf = DevicePrefetcher(make, depth=1)
    assert next(pf) == 1
    assert next(pf) == 2
    with pytest.raises(RuntimeError, match="boom"):
        next(pf)
    pf.close()


def test_close_unblocks_full_queue_producer():
    produced = []

    def make():
        produced.append(len(produced))
        return produced[-1]

    pf = DevicePrefetcher(make, depth=2)
    next(pf)
    time.sleep(0.3)  # let the producer fill the queue and block on put
    pf.close()
    assert not pf._thread.is_alive()
    # bounded production: one consumed + depth staged + at most one in
    # flight when close landed
    assert len(produced) <= 4


def test_close_is_idempotent_and_stops_iteration():
    it = iter(range(10))
    pf = DevicePrefetcher(lambda: next(it), depth=2)
    next(pf)
    pf.close()
    pf.close()
    with pytest.raises(StopIteration):
        next(pf)


def test_producer_runs_ahead_of_consumer():
    """The whole point: production overlaps the consumer's compute."""
    staged = threading.Event()
    n = {"v": 0}

    def make():
        n["v"] += 1
        if n["v"] >= 3:  # first consumed + 2 staged ahead
            staged.set()
        return n["v"]

    pf = DevicePrefetcher(make, depth=2)
    next(pf)  # consume one, then DON'T consume more
    assert staged.wait(timeout=5.0), "producer did not run ahead"
    pf.close()
