"""HBM-resident dataset cache: stage the raw dataset into device memory
once, gather batches on device — no per-step host feed at all.

TPU-native rationale: the parity datasets are small (Make3D train is a few
hundred frames ≈ 4 GB raw uint8; the synthetic sets are MBs) while a v5e
has 16 GB HBM. Staging the raw pool once turns the input pipeline into a
per-step on-device gather — zero H2D traffic in steady state, immune to
host/PCIe/tunnel bandwidth, and the gather fuses ahead of the fused
preprocess+train program. The reference (SURVEY §3.1) re-fed every batch
from the host per session.run; this is the opposite end of that design.

Sharding: on a multi-device data-parallel mesh the pool is sharded over
examples along the "data" axis and every device samples from ITS OWN
shard (shard-local shuffling — the standard sharded-dataset DP recipe;
the gather stays local via shard_map, no collectives). Statistically this
is per-epoch shuffling within fixed shards rather than a global shuffle.

Multi-host (r3): each process stages only its own devices' shards and
generates per-step indices for its local shards only — the gather program
is one global jit like the train step. Pass the FULL dataset, not a
ProcessShardView; the sampler owns the process partition.

Staging is host-RAM-bounded (r4): rather than materializing the full pool
on the host before one device_put, rows are streamed per shard in
<=STAGE_CHUNK_BYTES chunks into donated on-device buffers, then assembled
into the global sharded array via
`jax.make_array_from_single_device_arrays`. Measured on the true-scale
NYU pool (1.56 GB): peak anonymous host RSS 4.65 GB (full-stack put, pool
+ transport copy) -> 1.94 GB (chunked; process base + ~2 chunks). The
file-backed residency of memmap'd records (~pool bytes of reclaimable
page cache) is unchanged and counts in VmHWM but cannot OOM the host.

Selected with DataConfig.cache_device / --cache-device. Falls back loudly
if the dataset exceeds the HBM budget.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ann3depth_tpu.parallel import mesh as meshlib

log = logging.getLogger(__name__)

# Leave headroom for params/activations/XLA scratch.
DEFAULT_BYTE_BUDGET = 8 << 30

# Host-RAM bound for pool staging: rows are decoded and transferred in
# chunks of at most this many bytes (see _stage_pools).
STAGE_CHUNK_BYTES = 256 << 20


def stack_dataset(dataset):
    """Materialize a uniform-shape dataset -> (img_u8 [N,...], dep [N,...])
    host arrays. Shared by DevicePoolSampler and the convergence study.

    Fills preallocated arrays in place: collecting per-example tuples and
    np.stack-ing would transiently hold TWO copies of a multi-GB dataset
    on the host (Make3D raw is ~4 GB)."""
    n = len(dataset)
    img0, dep0 = dataset[0]
    imgs = np.empty((n, *np.shape(img0)), np.asarray(img0).dtype)
    deps = np.empty((n, *np.shape(dep0)), np.asarray(dep0).dtype)
    imgs[0], deps[0] = img0, dep0
    for i in range(1, n):
        im, de = dataset[i]
        if np.shape(im) != imgs.shape[1:] or np.shape(de) != deps.shape[1:]:
            raise ValueError(
                "device cache needs uniform example shapes — pack the "
                "dataset first (`prepare` subcommand) or drop "
                "--cache-device")
        imgs[i], deps[i] = im, de
    return imgs, deps


def _stage_pools(dataset, n, sharding, img0, dep0, chunk_bytes):
    """Stream dataset rows [0, n) into HBM as two sharded pool arrays
    without ever materializing a full field on the host.

    The sharding's `devices_indices_map` is the authoritative row->device
    assignment (correct for any mesh layout, replicas included — a model/tp
    axis makes several devices hold the SAME row-slice; they are grouped so
    each row is decoded from the dataset exactly once). Per shard, rows are
    read in <=chunk_bytes host chunks, device_put to each replica device,
    and written into a donated on-device buffer via dynamic_update_slice:
    host peak = one chunk, per-device peak = shard + chunk. Each process
    stages only its addressable shards (no collectives, multihost-safe)."""
    from functools import partial

    from jax.sharding import SingleDeviceSharding

    import time

    pid = jax.process_index()
    gshape_img = (n, *img0.shape)
    gshape_dep = (n, *dep0.shape)
    groups = {}
    for dev, idx in sharding.devices_indices_map(gshape_img).items():
        if dev.process_index != pid:
            continue
        r = idx[0]
        key = (r.start or 0, n if r.stop is None else r.stop)
        groups.setdefault(key, []).append(dev)

    # Staging progress (r5): a multi-GB pool through a slow link stages
    # for minutes with no output otherwise (observed: 9+ min for 1.56 GB
    # on a congested tunnel). Logged at most every ~15 s, so tests and
    # fast local links stay silent.
    ex_bytes = img0.nbytes + dep0.nbytes
    total_bytes = sum((stop - start) * len(devs) * ex_bytes
                      for (start, stop), devs in groups.items())
    done_bytes = 0
    t0 = last_log = time.perf_counter()

    chunk_n = max(1, int(chunk_bytes // (img0.nbytes + dep0.nbytes)))
    upd = jax.jit(
        lambda buf, chunk, start: jax.lax.dynamic_update_slice(
            buf, chunk, (start,) + (0,) * (buf.ndim - 1)),
        donate_argnums=0)

    img_bufs, dep_bufs = [], []
    for (start, stop), devs in sorted(groups.items()):
        rows = stop - start
        bufs = {}
        for dev in devs:
            sds = SingleDeviceSharding(dev)
            bufs[dev] = (
                jax.jit(partial(jnp.zeros, (rows, *img0.shape),
                                img0.dtype), out_shardings=sds)(),
                jax.jit(partial(jnp.zeros, (rows, *dep0.shape),
                                dep0.dtype), out_shardings=sds)())
        pending = None
        for a in range(0, rows, chunk_n):
            b = min(rows, a + chunk_n)
            ci = np.empty((b - a, *img0.shape), img0.dtype)
            cd = np.empty((b - a, *dep0.shape), dep0.dtype)
            for j in range(a, b):
                im, de = dataset[start + j]
                if (np.shape(im) != img0.shape
                        or np.shape(de) != dep0.shape):
                    raise ValueError(
                        "device cache needs uniform example shapes — pack "
                        "the dataset first (`prepare` subcommand) or drop "
                        "--cache-device")
                ci[j - a], cd[j - a] = im, de
            # Backpressure: async device_puts queue host-side copies in the
            # transport with no bound — without this sync, every chunk of a
            # multi-GB pool sits buffered at once and the host peak equals
            # the pool again (measured: VmHWM 4.4 GB for a 1.56 GB pool).
            # device_get of one element forces the PREVIOUS chunk's update
            # (and thus its transfer) to complete, so at most two chunks are
            # in flight — and this chunk's decode overlapped that transfer.
            # (block_until_ready acks at dispatch on this backend; only a
            # device_get is a true barrier — see utils/tracing.)
            if pending is not None:
                for buf in pending:
                    jax.device_get(buf[(0,) * buf.ndim])
            off = np.int32(a)
            for dev in devs:
                bi, bd = bufs[dev]
                bufs[dev] = (upd(bi, jax.device_put(ci, dev), off),
                             upd(bd, jax.device_put(cd, dev), off))
            pending = [x for pair in bufs.values() for x in pair]
            done_bytes += (ci.nbytes + cd.nbytes) * len(devs)
            now = time.perf_counter()
            if now - last_log > 15.0 and done_bytes < total_bytes:
                rate = done_bytes / max(now - t0, 1e-9)
                log.info(
                    "device cache: staging %.0f/%.0f MB (%.1f MB/s, "
                    "~%.0f s left)", done_bytes / 1e6, total_bytes / 1e6,
                    rate / 1e6, (total_bytes - done_bytes) / max(rate, 1.0))
                last_log = now
        for dev in devs:
            bi, bd = bufs[dev]
            img_bufs.append(bi)
            dep_bufs.append(bd)
    return (jax.make_array_from_single_device_arrays(
                gshape_img, sharding, img_bufs),
            jax.make_array_from_single_device_arrays(
                gshape_dep, sharding, dep_bufs))


class DevicePoolSampler:
    """Iterable of (img_u8, depth) device batches gathered from an
    HBM-resident pool. API-compatible with pipeline.feed.DeviceFeed's
    iteration contract (the train loop's `for (img, dep) in feed`)."""

    def __init__(self, dataset, batch_size, mesh, *, steps=None, seed=0,
                 byte_budget=DEFAULT_BYTE_BUDGET,
                 stage_chunk_bytes=STAGE_CHUNK_BYTES):
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
        # this process's count of data-axis devices (== n_data when
        # single-process)
        self.local_data = self.n_data // nproc

        # Trim to a shard-divisible example count (mirrors drop_remainder),
        # then stage only this process's contiguous block.
        n = (len(dataset) // self.n_data) * self.n_data
        if n < len(dataset):
            log.info("device cache: trimming %d example(s) for %d-way "
                     "sharding", len(dataset) - n, self.n_data)
        if n == 0:
            raise ValueError(
                f"dataset n={len(dataset)} is too small for "
                f"{self.n_data}-way sharding")
        img0, dep0 = dataset[0]
        img0, dep0 = np.asarray(img0), np.asarray(dep0)
        # n divides by n_data, n_data by nproc -> every process stages
        # exactly n/nproc rows; uniform shapes are enforced at staging.
        nbytes = (n // nproc) * (img0.nbytes + dep0.nbytes)
        if nbytes > byte_budget:
            raise ValueError(
                f"dataset is {nbytes / 1e9:.1f} GB raw per process — over "
                f"the {byte_budget / 1e9:.1f} GB device-cache budget; use "
                "the rotating-window pool (--cache-window-mb, optionally "
                "--window-epochs) or drop --cache-device")
        self.n = n
        self.nbytes = nbytes  # per-process raw pool bytes (budget math)
        self.shard = n // self.n_data
        self.per_dev = batch_size // self.n_data
        # The hazard iter_batches guards with the same error: a batch that
        # can't be filled would otherwise make __iter__ spin forever
        # computing empty epochs without yielding.
        if self.per_dev > self.shard:
            raise ValueError(
                f"batch_size={batch_size} needs {self.per_dev} examples "
                f"per device but each of the {self.n_data} shard(s) has "
                f"only {self.shard} (dataset n={len(dataset)})")
        self.batch_size = batch_size
        self.steps = steps
        self.seed = seed
        self._nproc = nproc
        # decorrelate the shard-local shuffles across processes; each
        # process permutes only its own devices' shards
        self._rng = np.random.default_rng(seed + 1000003 * pid)

        sharding = meshlib.batch_sharding(mesh)
        self.pool_img, self.pool_dep = _stage_pools(
            dataset, n, sharding, img0, dep0, stage_chunk_bytes)
        self._idx_sharding = sharding
        self._mesh = mesh
        log.info("device cache: staged %d examples (%.0f MB) across %d "
                 "device(s), process %d/%d", n, nproc * nbytes / 1e6,
                 self.n_data, pid, nproc)

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(meshlib.DATA_AXIS), P(meshlib.DATA_AXIS),
                      P(meshlib.DATA_AXIS)),
            out_specs=(P(meshlib.DATA_AXIS), P(meshlib.DATA_AXIS)))
        def _gather(pool_img, pool_dep, idx):
            # idx values are shard-LOCAL; the gather never leaves the
            # device (no collectives in this program).
            return pool_img[idx], pool_dep[idx]

        self._gather = jax.jit(_gather)
        # public alias: the scanned K-step driver (train/loop.py) embeds
        # this gather inside its block program.
        self.gather_fn = self._gather

    def _put(self, x, sharding):
        if self._nproc > 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    def _epoch_local_perms(self):
        """[local_data, shard] independent per-shard permutations (this
        process's data-axis devices only)."""
        return np.stack([self._rng.permutation(self.shard)
                         for _ in range(self.local_data)])

    def _total_steps(self):
        # steps=None -> exactly one epoch (iter_batches' contract).
        return (self.shard // self.per_dev if self.steps is None
                else self.steps)

    def _local_index_stream(self):
        """Host-side per-step shard-LOCAL index rows [local_data * per_dev]
        i32 — the single source of the sampling order for both the
        per-step iterator and the scanned-block driver."""
        step, total = 0, self._total_steps()
        while step < total:
            perms = self._epoch_local_perms()
            for b in range(self.shard // self.per_dev):
                if step >= total:
                    return
                # concat of per-device local index blocks: block d holds
                # indices into device d's shard.
                idx = perms[:, b * self.per_dev:(b + 1) * self.per_dev]
                yield np.ascontiguousarray(idx.reshape(-1).astype(np.int32))
                step += 1

    def __iter__(self):
        for idx in self._local_index_stream():
            idx = self._put(idx, self._idx_sharding)
            yield self._gather(self.pool_img, self.pool_dep, idx)

    def index_blocks(self, k: int):
        """Device-put [k, local_data * per_dev] index blocks — k steps of
        the SAME sampling stream __iter__ walks, grouped for the scanned
        K-step train driver (train/loop.py steps_per_dispatch). Sharded
        (None, data): lax.scan over the leading axis hands each step its
        per-device index row with no resharding."""
        from jax.sharding import NamedSharding

        if k < 1:
            raise ValueError(f"index_blocks needs k >= 1, got {k}")
        total = self._total_steps()
        if total % k:
            raise ValueError(
                f"steps={total} is not divisible by the {k}-step dispatch "
                "block (validated upstream; this is a hard shape "
                "constraint of the scanned program)")
        block_sharding = NamedSharding(
            self._mesh, P(None, meshlib.DATA_AXIS))
        stream = self._local_index_stream()
        for _ in range(total // k):
            block = np.stack([next(stream) for _ in range(k)])
            yield self._put(block, block_sharding)

    def fixed_batches(self, k: int):
        """Yield the SAME k batches on every call: the first `per_dev`
        examples of each shard in split order (no shuffle, no rng) —
        the deterministic fixed sample the in-loop eval compares across
        epochs (early stopping needs eval noise to come from the model,
        not the sample). Gathers from the resident pool: zero H2D."""
        if k * self.per_dev > self.shard:
            raise ValueError(
                f"fixed_batches({k}) needs {k * self.per_dev} examples per "
                f"shard but shards hold {self.shard}")
        for b in range(k):
            idx = np.tile(
                np.arange(b * self.per_dev, (b + 1) * self.per_dev,
                          dtype=np.int32), self.local_data)
            idx = self._put(idx, self._idx_sharding)
            yield self._gather(self.pool_img, self.pool_dep, idx)

    def close(self):
        """Free the HBM pool (DeviceFeed API compatibility)."""
        self.pool_img.delete()
        self.pool_dep.delete()
