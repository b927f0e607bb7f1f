"""Device mesh + sharding specs — the DP-over-ICI layer [B:5].

The reference had zero parallelism (SURVEY.md §2.3); the rebuild's binding
spec mandates data-parallel training over ICI. Design:

- 1-D mesh over all local devices, axis name "data". The axis-name space is
  reserved so a "model" axis can be added for the DPT stretch config without
  touching call sites (SURVEY §2.3 TP row).
- Batches are sharded over "data" via NamedSharding; params/opt-state are
  replicated. `jax.jit` then compiles the gradient all-reduce to an XLA
  `psum` riding ICI — no hand-written collectives needed at CNN scale.
- Tested on a fake 8-device CPU mesh (tests/conftest.py sets
  `--xla_force_host_platform_device_count=8`), the standard JAX substitute
  for multi-chip fixtures (SURVEY §4.6).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices: Optional[Sequence] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def create_mesh_2d(n_data: int, n_model: int,
                   devices: Optional[Sequence] = None) -> Mesh:
    """2-D (data, model) mesh for dp x tp (DPT path; SURVEY §2.3 TP row).

    The model axis is laid out minor (adjacent devices) so TP collectives
    ride the shortest ICI hops."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_data * n_model:
        raise ValueError(
            f"need {n_data * n_model} devices, have {len(devices)}")
    arr = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, "model"))


def auto_data_mesh(unit_batch: int, tp: int = 1) -> Mesh:
    """Widest data mesh that divides `unit_batch` (the per-step unit
    that shards over "data" — the microbatch when grad_accum>1).

    Single policy shared by train() and evaluate() so the two can never
    silently pick different meshes. Single-process hosts shrink the data
    axis to the widest divisor (the reference's small-batch configs must
    keep working anywhere); multi-process jobs must use every process's
    devices, so divisibility is required instead.

    tp > 1 reserves a minor "model" axis of that width (dp x tp, DPT TP
    path) and shrinks the data axis within the remaining devices. On
    multi-process meshes the model axis must fit within one process's
    devices (jax.devices() is process-major, so the minor tp axis then
    groups adjacent same-host devices — TP collectives ride ICI, never
    DCN) and, as for plain DP, every device must be used.
    """
    devices = jax.devices()
    if tp > 1:
        if jax.process_count() > 1 and jax.local_device_count() % tp:
            raise ValueError(
                f"tensor_parallel={tp} does not divide the "
                f"{jax.local_device_count()} devices of one process; the "
                "model axis must stay within a host so its collectives "
                "ride ICI")
        if len(devices) % tp:
            raise ValueError(f"{len(devices)} devices not divisible by "
                             f"tensor_parallel={tp}")
    # Shared shrink/divisibility policy for both the 1-D and dp x tp cases
    avail = len(devices) // tp
    n_data = avail
    if jax.process_count() > 1:
        if unit_batch % n_data:
            raise ValueError(
                f"per-step batch {unit_batch} is not divisible by the "
                f"{n_data}-wide data axis (multi-host meshes must span "
                "every process)")
    else:
        while unit_batch % n_data:
            n_data -= 1
        if n_data < avail:
            import logging
            logging.getLogger(__name__).warning(
                "batch %d not divisible by %d data-axis devices; "
                "using dp=%d x tp=%d", unit_batch, avail, n_data, tp)
    if tp > 1:
        return create_mesh_2d(n_data, tp)
    return create_mesh(devices[:n_data])


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading-dim (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a host batch (pytree of arrays) sharded over the data axis.

    Requires batch size divisible by the DATA-axis size (not the total mesh
    size: on a 2-D dp x tp mesh only the data axis splits the batch) —
    enforced loudly because XLA would otherwise pad silently and corrupt the
    loss mean.
    """
    n = mesh.shape[axis_name]
    sharding = batch_sharding(mesh, axis_name)

    def _put(x):
        if x.shape[0] % n:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by "
                f"{axis_name!r} axis size {n}")
        return jax.device_put(x, sharding)

    return jax.tree.map(_put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh.

    On a multi-process mesh device_put cannot address remote shards;
    replication goes through make_array_from_callback instead (every
    process holds the same host values — parallel/multihost.py)."""
    if jax.process_count() > 1:
        from ann3depth_tpu.parallel import multihost
        return multihost.replicate_global(tree, replicated(mesh))
    return jax.device_put(tree, replicated(mesh))
