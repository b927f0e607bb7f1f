"""Explicit-collective DP training step via shard_map (SURVEY §2.3, §5
"Distributed communication backend").

Two equivalent realizations of data-parallel training exist in this
framework:

  1. `train/step.py` + `parallel/mesh.py` — the production path: inputs
     carry NamedShardings and jit's sharding propagation *derives* the
     gradient all-reduce (an XLA `psum` riding ICI).
  2. This module — the same step written with `shard_map`, where the
     collective is EXPLICIT (`jax.lax.pmean(grads, "data")`). Per-device
     code sees its local batch shard; nothing is implicit.

Why both: the explicit form is the cross-check (tested equal to the
propagation path up to reduction order on the fake-device CPU mesh) and
the template for topologies where propagation needs steering (multi-host
DCN vs ICI, reduce_scatter optimizer sharding). The reference had no
distributed anything (SURVEY §2.3) — this is rebuild-native design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ann3depth_tpu.parallel.mesh import DATA_AXIS
from ann3depth_tpu.pipeline import preprocess
from ann3depth_tpu.train import losses


def make_dp_train_step(mesh, *, input_hw, target_hw, si_lambda=0.5,
                       augment=False, resize_precision="highest"):
    """Build a jitted shard_map DP train step over `mesh`'s data axis.

    Returned fn: (state, img_u8 [B,H,W,3], depth [B,dh,dw], rng) ->
    (state, metrics); B must be divisible by the data-axis size. State is
    replicated; each device computes grads on its local shard, then an
    explicit pmean over "data" synchronizes the update (every device
    applies the identical averaged gradient, so replication is preserved).
    """
    input_hw, target_hw = tuple(input_hw), tuple(target_hw)
    prec = (jax.lax.Precision.HIGHEST if resize_precision == "highest"
            else jax.lax.Precision.DEFAULT)

    def per_device_step(state, img_u8, depth_raw, rng):
        if augment:
            # fold in the device's mesh position so augmentation draws
            # differ per shard (the global-batch semantics of the
            # propagation path use per-example rows of one key; here each
            # shard draws from its own derived key).
            idx = jax.lax.axis_index(DATA_AXIS)
            key = jax.random.fold_in(jax.random.fold_in(rng, state.step), idx)
        else:
            key = None
        images, depths = preprocess.preprocess_batch(
            img_u8, depth_raw, input_hw, target_hw, key=key,
            use_pallas=False, precision=prec)

        def loss_fn(params):
            pred_log = state.apply_fn({"params": params}, images)
            return losses.scale_invariant_log_loss(
                pred_log, depths, lam=si_lambda), pred_log

        (loss, pred_log), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # THE collective: average gradients (and scalar metrics) over the
        # data axis. XLA lowers this to an ICI all-reduce.
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        rmse = jax.lax.pmean(
            losses.depth_metrics(pred_log, depths)["rmse"], DATA_AXIS)

        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "rmse": rmse,
                   "grad_norm": optax.global_norm(grads)}
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt_state), metrics

    sharded = jax.shard_map(
        per_device_step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,  # updates are identical across devices post-pmean
    )
    return jax.jit(sharded, donate_argnums=(0,))
