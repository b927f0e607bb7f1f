"""Multi-host (multi-process) data-parallel training.

The reference was strictly single-process (SURVEY.md §2.3 — its only
scale-out was independent SGE jobs with zero communication); this module
is rebuild-native scaling design: JAX multi-controller SPMD. One process
per host joins a `jax.distributed` cluster; the mesh spans every
process's devices; the SAME jitted train step then runs unchanged — XLA
partitions the gradient all-reduce hierarchically, riding ICI within a
host and DCN (or gloo on CPU) across hosts. Nothing in models/, ops/, or
train/step.py knows whether the mesh is one host or many.

What multi-host changes (and all it changes):
- arrays: a host can only materialize its own shards, so batches are
  assembled with `jax.make_array_from_process_local_data` and replicated
  state with `jax.make_array_from_callback` (plain device_put cannot
  address remote shards);
- data: each process reads a disjoint strided slice of the dataset
  (`data.batching.ProcessShardView`) and feeds batch_size/process_count
  frames per step;
- output: metrics/TB/viz writers run on process 0 only; orbax
  checkpointing is called by EVERY process (it coordinates internally
  and needs a filesystem all hosts share).

Tested end-to-end with 2 CPU processes x 4 fake devices each (gloo
collectives): tests/test_multihost.py trains lockstep and asserts both
processes see identical replicated losses.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator=None, num_processes=None, process_id=None):
    """Join (or form) the jax.distributed cluster.

    With no arguments, defers to jax.distributed.initialize()'s
    auto-detection (TPU pod metadata / cluster env vars). Explicit
    coordinator/num_processes/process_id is the CPU-test and bare-metal
    path. On the CPU backend, cross-process collectives need the gloo
    implementation (set lazily here; a no-op where unsupported).
    """
    # Idempotence guard that must NOT touch the backend: jax.process_count()
    # would initialize XLA, after which distributed.initialize refuses to
    # run. The distributed client handle is the side-effect-free signal.
    try:
        from jax._src import distributed as _dist
        if _dist.global_state.client is not None:
            return  # already initialized
    except Exception:
        pass
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # config not present in this jax build: TPU-only use
        pass
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def replicate_global(tree, sharding):
    """Host pytree -> fully-replicated global arrays on a (possibly
    multi-process) sharding. Every process must hold the same values —
    true for seeded init and for checkpoint restores from shared storage.
    """
    def _rep(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.tree.map(_rep, tree)


def replicated_key(seed: int, mesh) -> jax.Array:
    """Seed -> PRNG key replicated over a (possibly multi-process) mesh.

    Multi-process jit rejects process-local jax.Arrays (a bare
    jax.random.key lives on local device 0); numpy inputs are allowed
    when identical on all processes, so build the key from its raw data
    inside a jit with replicated out_sharding.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    data = np.asarray(jax.random.key_data(jax.random.key(seed)))
    return jax.jit(jax.random.wrap_key_data,
                   out_shardings=NamedSharding(mesh, P()))(data)


def global_batch_from_local(local_batch, sharding):
    """Per-process local batch shard -> global batch-sharded array.

    Each process contributes its own batch_size/process_count rows; the
    global shape is inferred by concatenation over processes along the
    sharded (leading) dim.
    """
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)
