"""DeviceFeed tests: prefetch behavior, backpressure, error propagation."""

import time

import numpy as np
import pytest

from ann3depth_tpu.pipeline.feed import DeviceFeed


def _batches(n, fail_at=None):
    for i in range(n):
        if fail_at is not None and i == fail_at:
            raise RuntimeError("loader exploded")
        yield {"x": np.full((2, 4), i, np.float32)}


def test_feed_yields_all_batches_in_order():
    feed = DeviceFeed(_batches(5), prefetch=2)
    seen = [int(np.asarray(b["x"])[0, 0]) for b in feed]
    assert seen == [0, 1, 2, 3, 4]


def test_feed_propagates_worker_error():
    feed = DeviceFeed(_batches(10, fail_at=3), prefetch=2)
    got = []
    with pytest.raises(RuntimeError, match="loader exploded"):
        for b in feed:
            got.append(int(np.asarray(b["x"])[0, 0]))
    assert got == [0, 1, 2]


def test_feed_close_unblocks_producer():
    """close() must terminate a worker blocked on a full queue."""
    def slow_infinite():
        i = 0
        while True:
            yield {"x": np.full((1,), i, np.float32)}
            i += 1

    feed = DeviceFeed(slow_infinite(), prefetch=1)
    next(feed)
    feed.close()
    t0 = time.time()
    feed._thread.join(timeout=5)
    assert not feed._thread.is_alive()
    assert time.time() - t0 < 5


def test_feed_prefetch_overlaps():
    """The worker runs ahead: after consuming batch 0, later batches are
    already staged (queue non-empty without waiting)."""
    feed = DeviceFeed(_batches(4), prefetch=2)
    next(feed)
    time.sleep(0.2)
    assert feed._q.qsize() >= 1
    feed.close()
