"""Tracing/profiling utilities (SURVEY §5 "Tracing / profiling").

- `trace(logdir)`: context manager around hot loops emitting a TensorBoard/
  Perfetto trace via jax.profiler (viewable with xprof/tensorboard).
- `device_sync(x)`: reliable completion barrier. On this environment's
  tunneled TPU, `block_until_ready` returns at dispatch-ack (verified
  2026-08-16 — it reported a 8192^3 matmul at 40 PFLOP/s), so all timing
  code must synchronize by materializing a scalar with device_get.
- `StepTimer`: host-side ring of recent step wall-times -> p50/p99, used by
  the train loop and live path for observability without profiler overhead.
"""

from __future__ import annotations

import collections
import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def device_sync(x) -> float:
    """Force completion of everything `x` depends on; returns a scalar."""
    leaf = jax.tree.leaves(x)[0]
    return float(jax.device_get(jnp.ravel(leaf)[0]))


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace around a block: with trace('/tmp/tb'): ..."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-time stats for loop steps."""

    def __init__(self, window: int = 200):
        self._times = collections.deque(maxlen=window)
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self._times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def stats(self) -> dict:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "step_ms_p50": float(np.percentile(arr, 50) * 1e3),
            "step_ms_p99": float(np.percentile(arr, 99) * 1e3),
            "step_ms_mean": float(arr.mean() * 1e3),
        }
