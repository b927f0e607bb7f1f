"""Rotating-window HBM pool: device-cache training for datasets LARGER
than the device budget (`--cache-window-mb`), with optional data echoing
(`--window-epochs`).

Why this exists: the train step consumes raw input bytes at
`img/s x bytes/img` — encdec b16 at 8.3k img/s is ~12 GB/s of uint8, more
than ANY host link sustains (PCIe4 x16 is ~25 GB/s theoretical, real TPU
host links less; this environment's tunnel is ~0.05 GB/s). The full
HBM-resident pool (`pipeline/device_cache.py`) sidesteps the link entirely
but hard-gates on `dataset <= byte budget`. This module covers the gap:

- The dataset is visited through fixed-size HBM **windows** (two resident
  buffers: the active window trains while a background thread stages the
  next one through the link — the same double-buffering idea as
  `pipeline/feed.py`, at window rather than batch granularity, so the
  steady-state device path is still an on-device gather with zero per-step
  host involvement).
- **Data echoing** (Choi et al. 2019, "Faster Neural Network Training with
  Data Echoing"): `window_epochs=E` trains E shard-local passes over each
  window before rotating, dividing the link bandwidth demand by E. With
  `t_stage` the window staging time and `t_train` one pass over it, the
  sustained rate is `device_rate * min(1, E*t_train / max(E*t_train,
  t_stage))` — E is the dial that moves a link-bound run toward the
  device rate.

Sampling statistics: each pass draws ONE global permutation of the
dataset (shared across processes) and partitions it into windows — a
window-granular global shuffle, strictly better mixing than fixed shards.
Within a window, sampling is shard-local per echo epoch (the
`device_cache.py` recipe). Echoing repeats examples within a window
before the next window is seen; the quality cost is priced on this
project's convergence protocol in `benchmarks/exp_echo_quality.py`
(E<=16 free, +4.7/+3.1% at E=32/64, +12.2% at E=128 — the measured
clamp in `pick_window_epochs`). The per-pass tail (`n mod window`) is
dropped, but a fresh permutation re-draws it every pass, so coverage is
uniform in expectation.

Multi-host: every process computes the same window permutation (seeded
rng), stages only its own devices' shard of each window
(`device_cache._stage_pools` is process-local), and samples shard-locally
— no collectives anywhere in the input path.
"""

from __future__ import annotations

import logging
import queue
import threading

import jax
import numpy as np

from ann3depth_tpu.parallel import mesh as meshlib
from ann3depth_tpu.pipeline.device_cache import (
    DEFAULT_BYTE_BUDGET, STAGE_CHUNK_BYTES, _stage_pools)

log = logging.getLogger(__name__)


def pick_window_epochs(t_stage, t_train, batches_per_window,
                       steps_per_dispatch=1, max_epochs=64):
    """The echo factor that hides window staging behind training.

    With `t_stage` = one window's staging wall time and `t_train` = one
    shard-local pass over it, the rotating pool sustains the device rate
    iff `E * t_train >= t_stage` (module docstring). Returns the smallest
    such E, rounded UP so the window's step count (batches_per_window * E)
    stays a multiple of the scanned-dispatch block (a scanned block must
    not span windows — `index_blocks`), clamped to `max_epochs`.

    The clamp default is the measured quality boundary
    (benchmarks/exp_echo_quality.py, matched 4000-step budget, r4+r5):
    E<=16 is quality-free (+-1.1% eval RMSE vs iid), E=32/64 cost
    +4.7%/+3.1%, E=128 costs +12.2% — so auto stops at 64, where the
    cost is priced and modest; a deliberately larger factor (accepting
    the measured cost for a slower link) needs an explicit
    --window-epochs."""
    import math

    if t_stage < 0 or t_train < 0:
        raise ValueError(f"negative times: {t_stage=}, {t_train=}")
    e = max(1, -(-int(t_stage * 1e6) // max(int(t_train * 1e6), 1)))
    # (batches * e) % spd == 0  <=>  e is a multiple of spd/gcd(batches,spd)
    quantum = (steps_per_dispatch
               // math.gcd(batches_per_window, steps_per_dispatch)
               if steps_per_dispatch > 1 else 1)
    e = -(-e // quantum) * quantum
    if e > max_epochs:
        clamped = max(max_epochs // quantum * quantum, quantum)
        if clamped > max_epochs:
            raise ValueError(
                f"no echo factor <= {max_epochs} makes {batches_per_window}"
                f" batches/window divisible by steps_per_dispatch="
                f"{steps_per_dispatch}; align --cache-window-mb or K")
        log.warning(
            "auto window-epochs clamped to %d (staging %.1fs vs pass "
            "%.2fs wants x%d) — the link stays the binding term; raise "
            "--cache-window-mb or accept the stall", clamped, t_stage,
            t_train, e)
        e = clamped
    return e


def calibrate_window_epochs(dataset, batch_size, mesh, *, window_bytes,
                            run_pass, steps_per_dispatch=1, max_epochs=64,
                            seed=0, byte_budget=DEFAULT_BYTE_BUDGET):
    """Measure one window's staging time and one training pass over it,
    return `pick_window_epochs` of the two (the `--window-epochs auto`
    implementation; train/loop.py wires it).

    `run_pass(batches)` must drain the iterable of (img_u8, depth) device
    batches through the caller's real train step and SYNC before
    returning (device_get a metric). It runs twice: once for compile +
    warmup (the real loop reuses the in-process compile cache, so this
    costs the run nothing extra), once timed. The probe stages two
    windows through the link (the first measured, the second overlapping
    the passes exactly as steady state does) and drops them; the real
    sampler restages from scratch. close() waits out the second window's
    in-flight staging — bounded by one t_stage of dead wall time, the
    price of measuring t_train under steady-state link contention.

    Bias directions of the measured E: t_stage includes the staging
    programs' one-time compiles and cold page-cache reads (first window
    only), so it errs LARGE — E over-picked, a bounded quality cost
    (priced by benchmarks/exp_echo_quality.py: ±1.1% RMSE through E=16)
    but never a stall. t_train errs small when the real step is a
    zero1/distill variant a few percent slower than the plain step used
    here — E under-picked, a partial stall. The chosen E is logged, and
    the train loop persists it next to the checkpoints
    (<ckpt_dir>/window_epochs.json) and REUSES it on resume instead of
    recalibrating (r5): the index stream depends on E and calibration
    timing is not deterministic, so a recalibrated resume would silently
    walk a different stream. An explicit --window-epochs still pins it
    (a mismatch against the persisted factor warns)."""
    import time

    probe = StreamingPoolSampler(dataset, batch_size, mesh,
                                 window_bytes=window_bytes, window_epochs=1,
                                 steps=None, seed=seed,
                                 byte_budget=byte_budget)
    try:
        windows = probe._windows(2)
        t0 = time.perf_counter()
        pool_img, pool_dep = next(windows)
        # block_until_ready acks at dispatch on the tunneled backend
        # (utils/tracing; measured in bench_feed.bench_link: 28 ms "ready"
        # vs 405 ms until a kernel can read the data) — only a consuming
        # read is a true barrier. Gather one batch from the staged pools
        # and pull a row-slice per example to host: the gather depends on
        # every shard's final update, so this completes only after all
        # staging transfers landed.
        idx = probe._put(np.zeros(probe.local_data * probe.per_dev,
                                  np.int32), probe._sharding)
        g_img, g_dep = probe._gather(pool_img, pool_dep, idx)
        jax.device_get((g_img[(slice(None),) + (0,) * (g_img.ndim - 1)],
                        g_dep[(slice(None),) + (0,) * (g_dep.ndim - 1)]))
        t_stage = time.perf_counter() - t0

        def batches():
            for idx in probe._window_local_indices():
                idx = probe._put(idx, probe._sharding)
                yield probe._gather(pool_img, pool_dep, idx)

        run_pass(batches())  # compile + warmup
        t0 = time.perf_counter()
        run_pass(batches())  # timed
        t_train = time.perf_counter() - t0
    finally:
        probe.close()
    batches_per_window = probe.win_shard // probe.per_dev
    e = pick_window_epochs(t_stage, t_train, batches_per_window,
                           steps_per_dispatch, max_epochs=max_epochs)
    log.info(
        "auto window-epochs: staging %.2fs vs %.3fs/pass (%d batches) "
        "-> echo x%d (pin with --window-epochs %d for reproducible "
        "resumes)", t_stage, t_train, batches_per_window, e, e)
    return e


class _PermView:
    """Read-only dataset view through a permutation slice (the staging
    worker walks windows in permuted order without materializing rows)."""

    def __init__(self, dataset, perm):
        self._dataset = dataset
        self._perm = perm

    def __len__(self):
        return len(self._perm)

    def __getitem__(self, i):
        return self._dataset[int(self._perm[i])]


class StreamingPoolSampler:
    """Iterable of (img_u8, depth) device batches gathered from a rotating
    HBM window pool. API-compatible with DevicePoolSampler's loop contract
    (`__iter__`, `index_blocks`, `pool_img`/`pool_dep`/`gather_fn`,
    `nbytes`, `close`)."""

    def __init__(self, dataset, batch_size, mesh, *, window_bytes,
                 window_epochs=1, steps=None, seed=0,
                 byte_budget=DEFAULT_BYTE_BUDGET,
                 stage_chunk_bytes=STAGE_CHUNK_BYTES):
        import functools

        from jax.sharding import PartitionSpec as P

        self.n_data = mesh.shape.get(meshlib.DATA_AXIS, 1)
        nproc = jax.process_count()
        pid = jax.process_index()
        if batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {batch_size}")
        if batch_size % self.n_data:
            raise ValueError(
                f"batch_size={batch_size} not divisible by data axis "
                f"{self.n_data}")
        if self.n_data % nproc:
            raise ValueError(
                f"data axis {self.n_data} must distribute evenly over "
                f"{nproc} processes for --cache-device")
        if window_epochs < 1:
            raise ValueError(
                f"window_epochs must be >= 1, got {window_epochs}")
        self.local_data = self.n_data // nproc
        self.per_dev = batch_size // self.n_data
        self.batch_size = batch_size
        self.window_epochs = window_epochs

        img0, dep0 = dataset[0]
        img0, dep0 = np.asarray(img0), np.asarray(dep0)
        self._img0, self._dep0 = img0, dep0
        ex_bytes = img0.nbytes + dep0.nbytes
        # Window rows: a multiple of batch_size so every window splits into
        # whole per-shard batches (no silent within-window drops), derived
        # from the requested byte size.
        win = (int(window_bytes) // ex_bytes) // batch_size * batch_size
        if win < batch_size:
            raise ValueError(
                f"cache window of {window_bytes / 1e6:.0f} MB holds "
                f"{int(window_bytes) // ex_bytes} examples "
                f"({ex_bytes / 1e6:.2f} MB each) — smaller than one "
                f"batch_size={batch_size}; raise --cache-window-mb")
        n = len(dataset)
        if win >= n:
            raise ValueError(
                f"cache window ({win} examples) >= dataset (n={n}): "
                "windowing would re-stage the whole set every pass — drop "
                "--cache-window-mb and use plain --cache-device")
        # Two windows resident (active + staging) is the design's HBM
        # footprint; per process each holds win/nproc rows.
        win_proc_bytes = (win // nproc) * ex_bytes
        if 2 * win_proc_bytes > byte_budget:
            raise ValueError(
                f"double-buffered window needs 2 x {win_proc_bytes / 1e9:.1f}"
                f" GB per process — over the {byte_budget / 1e9:.1f} GB "
                "device-cache budget; lower --cache-window-mb")
        self.n = n
        self.win = win
        self.win_shard = win // self.n_data
        self.nbytes = 2 * win_proc_bytes  # budget accounting (eval pool)
        self.steps = steps
        self.steps_per_window = (self.win_shard // self.per_dev
                                 ) * window_epochs
        self.windows_per_pass = n // win
        self._sharding = meshlib.batch_sharding(mesh)
        self._mesh = mesh
        self._nproc = nproc
        self._chunk_bytes = stage_chunk_bytes
        self._dataset = dataset
        # Window permutations are shared across processes (global shuffle);
        # within-window echo shuffles are shard-local and decorrelated.
        self._window_rng = np.random.default_rng(seed)
        self._rng = np.random.default_rng(seed + 1000003 * pid)

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(meshlib.DATA_AXIS), P(meshlib.DATA_AXIS),
                      P(meshlib.DATA_AXIS)),
            out_specs=(P(meshlib.DATA_AXIS), P(meshlib.DATA_AXIS)))
        def _gather(pool_img, pool_dep, idx):
            return pool_img[idx], pool_dep[idx]

        self._gather = jax.jit(_gather)
        self.gather_fn = self._gather
        self.pool_img = self.pool_dep = None  # set per active window

        # Staging worker: strict request/response handshake — the worker
        # stages exactly one window per request, so at most two windows
        # are ever resident (the active one + the one being staged). A
        # queue.Queue(maxsize=1) alone would let the worker run one MORE
        # window ahead (staged result parked in the queue while it builds
        # the next), i.e. three resident.
        self._req = queue.Queue()
        self._res = queue.Queue()
        self._worker = threading.Thread(
            target=self._stage_worker, daemon=True,
            name="streaming-pool-stager")
        self._worker.start()
        self._pending = 0  # requests issued minus results consumed
        log.info(
            "streaming pool: %d windows of %d examples per pass "
            "(%.0f MB x2 resident per process), %d steps/window "
            "(echo x%d), dataset n=%d",
            self.windows_per_pass, win, win_proc_bytes / 1e6,
            self.steps_per_window, window_epochs, n)

    # -- staging -----------------------------------------------------------

    def _stage_worker(self):
        while True:
            perm = self._req.get()
            if perm is None:
                return
            try:
                view = _PermView(self._dataset, perm)
                self._res.put(_stage_pools(
                    view, self.win, self._sharding, self._img0, self._dep0,
                    self._chunk_bytes))
            except BaseException as e:  # surface in the train loop
                self._res.put(e)
                return

    def _window_perms(self):
        """Infinite stream of per-window permutation slices: each pass is
        one fresh global permutation partitioned into full windows."""
        while True:
            pass_perm = self._window_rng.permutation(self.n)
            for w in range(self.windows_per_pass):
                yield pass_perm[w * self.win:(w + 1) * self.win]

    def _windows(self, count):
        """Yield `count` staged (pool_img, pool_dep) windows, keeping one
        staging request in flight so the next window uploads while the
        current one trains — and never requesting a window that won't be
        consumed (a run would otherwise end by staging one full window
        nobody reads, and close() would sit out that transfer)."""
        if count < 1:
            return
        perms = self._window_perms()
        self._req.put(next(perms))
        self._pending += 1
        issued = 1
        for _ in range(count):
            res = self._res.get()
            self._pending -= 1
            if isinstance(res, BaseException):
                raise RuntimeError(
                    "streaming pool staging worker failed") from res
            if issued < count:
                self._req.put(next(perms))
                self._pending += 1
                issued += 1
            yield res

    # -- sampling ----------------------------------------------------------

    def _total_steps(self):
        # steps=None -> exactly one pass over the windowed dataset.
        return (self.windows_per_pass * self.steps_per_window
                if self.steps is None else self.steps)

    def _window_local_indices(self):
        """steps_per_window shard-local index rows [local_data * per_dev]
        i32 for ONE window visit: window_epochs fresh per-shard
        permutations of the window shard."""
        batches = self.win_shard // self.per_dev
        for _ in range(self.window_epochs):
            perms = np.stack([self._rng.permutation(self.win_shard)
                              for _ in range(self.local_data)])
            for b in range(batches):
                idx = perms[:, b * self.per_dev:(b + 1) * self.per_dev]
                yield np.ascontiguousarray(idx.reshape(-1).astype(np.int32))

    def _put(self, x, sharding):
        if self._nproc > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    def _windows_needed(self, total_steps):
        return -(-total_steps // self.steps_per_window)

    def __iter__(self):
        step, total = 0, self._total_steps()
        windows = self._windows(self._windows_needed(total))
        while step < total:
            self.pool_img, self.pool_dep = next(windows)
            for idx in self._window_local_indices():
                if step >= total:
                    break
                idx = self._put(idx, self._sharding)
                yield self._gather(self.pool_img, self.pool_dep, idx)
                step += 1

    def index_blocks(self, k: int):
        """[k, local_data * per_dev] index blocks for the scanned K-step
        driver — the same stream __iter__ walks. Updates pool_img/pool_dep
        at window boundaries BEFORE yielding the window's first block (the
        loop reads them per dispatch), so k must divide steps_per_window:
        a scanned block cannot change pools mid-program."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if k < 1:
            raise ValueError(f"index_blocks needs k >= 1, got {k}")
        if self.steps_per_window % k:
            raise ValueError(
                f"steps_per_dispatch={k} must divide the window's "
                f"{self.steps_per_window} steps ({self.win_shard // self.per_dev}"
                f" batches x {self.window_epochs} echo epochs): a scanned "
                "block gathers from ONE resident window — align the window "
                "size (--cache-window-mb) or K")
        total = self._total_steps()
        if total % k:
            raise ValueError(
                f"steps={total} is not divisible by the {k}-step dispatch "
                "block (validated upstream; this is a hard shape "
                "constraint of the scanned program)")
        block_sharding = NamedSharding(
            self._mesh, P(None, meshlib.DATA_AXIS))
        step, windows = 0, self._windows(self._windows_needed(total))
        while step < total:
            self.pool_img, self.pool_dep = next(windows)
            stream = self._window_local_indices()
            for _ in range(self.steps_per_window // k):
                if step >= total:
                    break
                block = np.stack([next(stream) for _ in range(k)])
                yield self._put(block, block_sharding)
                step += k

    def close(self):
        """Stop the staging worker and drop the resident windows."""
        self._req.put(None)
        # Unblock a worker that already finished a request nobody will
        # consume, then drop the buffers. The timeout only bites when close
        # lands mid-staging on a slow link; the worker is a daemon thread,
        # so a timed-out join leaks the window until process exit, no hang.
        while self._pending > 0:
            try:
                self._res.get(timeout=600.0)
            except queue.Empty:
                break
            self._pending -= 1
        self._worker.join(timeout=60.0)
        self.pool_img = self.pool_dep = None
