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


class DevicePoolSampler:
    """Iterable of (img_u8, depth) device batches gathered from an
    HBM-resident pool. API-compatible with pipeline.feed.DeviceFeed's
    iteration contract (the train loop's `for (img, dep) in feed`)."""

    def __init__(self, dataset, batch_size, mesh, *, steps=None, seed=0,
                 byte_budget=DEFAULT_BYTE_BUDGET):
        self.n_data = mesh.shape.get(meshlib.DATA_AXIS, 1)
        if batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {batch_size}")
        if batch_size % self.n_data:
            raise ValueError(
                f"batch_size={batch_size} not divisible by data axis "
                f"{self.n_data}")
        img, dep = stack_dataset(dataset)
        nbytes = img.nbytes + dep.nbytes
        if nbytes > byte_budget:
            raise ValueError(
                f"dataset is {nbytes / 1e9:.1f} GB raw — over the "
                f"{byte_budget / 1e9:.1f} GB device-cache budget; drop "
                "--cache-device for this dataset")
        # Trim to a shard-divisible example count (mirrors drop_remainder).
        n = (len(img) // self.n_data) * self.n_data
        if n < len(img):
            log.info("device cache: trimming %d example(s) for %d-way "
                     "sharding", len(img) - n, self.n_data)
        img, dep = img[:n], dep[:n]
        self.n = n
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
        self._rng = np.random.default_rng(seed)

        sharding = meshlib.batch_sharding(mesh)
        self.pool_img = jax.device_put(img, sharding)
        self.pool_dep = jax.device_put(dep, sharding)
        self._idx_sharding = sharding
        log.info("device cache: staged %d examples (%.0f MB) across %d "
                 "device(s)", n, nbytes / 1e6, self.n_data)

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

    def _epoch_local_perms(self):
        """[n_data, shard] independent per-shard permutations."""
        return np.stack([self._rng.permutation(self.shard)
                         for _ in range(self.n_data)])

    def __iter__(self):
        # steps=None -> exactly one epoch (iter_batches' contract).
        total = (self.shard // self.per_dev if self.steps is None
                 else self.steps)
        step = 0
        while step < total:
            perms = self._epoch_local_perms()
            for b in range(self.shard // self.per_dev):
                if step >= total:
                    return
                # concat of per-device local index blocks: block d holds
                # indices into device d's shard.
                idx = perms[:, b * self.per_dev:(b + 1) * self.per_dev]
                idx = jax.device_put(
                    np.ascontiguousarray(idx.reshape(-1).astype(np.int32)),
                    self._idx_sharding)
                yield self._gather(self.pool_img, self.pool_dep, idx)
                step += 1

    def close(self):
        """Free the HBM pool (DeviceFeed API compatibility)."""
        self.pool_img.delete()
        self.pool_dep.delete()
