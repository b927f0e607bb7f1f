"""Double-buffered host->device feed [B:5] (SURVEY.md §1 L2 rebuild).

The reference alternated host-side batch prep with one blocking runtime call
per step (SURVEY §3.1) — the classic host/device ping-pong. This feed
eliminates it:

- a background thread pulls raw uint8 batches from the (host) dataset
  iterator and issues `jax.device_put` with the target sharding *ahead* of
  consumption;
- device_put is async in JAX — the H2D DMA overlaps the previous step's
  compute; by the time train_step dequeues a batch its transfer is done or
  in flight;
- a bounded queue (depth = prefetch, default 2 = classic double buffering)
  provides backpressure so at most `prefetch` batches of HBM are pinned.

Shipping uint8 (not f32) cuts H2D bytes 4x; normalization happens on device
inside the jitted step (train/step.py).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax

_SENTINEL = object()


class DeviceFeed:
    """Wrap a host batch iterator into an async device-placing prefetcher."""

    def __init__(self, host_iter: Iterator, sharding=None, prefetch: int = 2):
        self._host_iter = host_iter
        self._sharding = sharding
        self._q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put_device(self, batch):
        if self._sharding is not None:
            if jax.process_count() > 1:
                # Multi-host: this process's local rows -> its shards of
                # the global batch array (device_put cannot address the
                # other hosts' shards; parallel/multihost.py).
                return jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        self._sharding, x), batch)
            return jax.tree.map(
                lambda x: jax.device_put(x, self._sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    def _worker(self):
        try:
            for batch in self._host_iter:
                if self._stop.is_set():
                    return
                item = self._put_device(batch)
                # stop-aware put: close() may have drained and gone away
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surface in consumer thread
            self._err = e
        finally:
            # deliver the sentinel without deadlocking if the consumer is
            # gone (queue full + nobody draining after close()).
            while True:
                try:
                    self._q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    if self._stop.is_set():
                        break

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # Drain so the worker can exit if blocked on put().
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)
