"""ZeRO-1 data-parallel step: reduce-scattered grads, sharded optimizer
state, all-gathered params (SURVEY §5 "Distributed communication backend").

The replicated-DP paths (`train/step.py`, `parallel/shard_step.py`) keep a
full Adam moment pair on every device — 2x params of duplicated state per
device. This variant shards the optimizer along the data axis:

  per device (shard_map over "data", explicit collectives):
    1. local grads on the local batch shard           (compute)
    2. `psum_scatter` each grad leaf -> 1/N flat chunk (reduce_scatter, ICI)
    3. global-norm clip: local sumsq + `psum`          (all_reduce, scalar)
    4. Adam update on the 1/N chunk only               (sharded opt state)
    5. `all_gather` updated chunks -> full params      (all_gather, ICI)

Communication per step is the same byte volume as replicated DP's gradient
all-reduce (reduce_scatter + all_gather IS an all-reduce, split around the
update), but optimizer memory and update FLOPs drop by N. On a pod slice
this is the standard recipe for fitting larger models/batches; here it is
correctness-tested against the replicated path on the fake-device CPU mesh
(tests/test_zero1.py).

The reference has no distributed training at all (SURVEY §2.3); this is
rebuild-native design, following the public ZeRO-1 recipe (Rajbhandari et
al. 2020) expressed as JAX collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ann3depth_tpu.parallel.mesh import DATA_AXIS
from ann3depth_tpu.pipeline import preprocess
from ann3depth_tpu.train import losses
from ann3depth_tpu.train.step import accumulate_microbatches, ema_update


def _chunk_size(n_elems: int, n_dev: int) -> int:
    return (n_elems + n_dev - 1) // n_dev


def _local_chunk(x, idx, n_dev):
    """Replicated array -> this device's padded flat [chunk] f32 slice."""
    flat = x.reshape(-1).astype(jnp.float32)
    chunk = _chunk_size(flat.size, n_dev)
    flat = jnp.pad(flat, (0, chunk * n_dev - flat.size))
    return jax.lax.dynamic_slice_in_dim(flat, idx * chunk, chunk)


def _scatter_grad(g, n_dev):
    """Full local grad leaf -> reduce-scattered mean flat [chunk] chunk."""
    flat = g.reshape(-1).astype(jnp.float32)
    chunk = _chunk_size(flat.size, n_dev)
    flat = jnp.pad(flat, (0, chunk * n_dev - flat.size))
    return jax.lax.psum_scatter(flat, DATA_AXIS, scatter_dimension=0,
                                tiled=True) / n_dev


def _gather_params(chunks, like):
    """All-gather updated chunks and restore original shapes/dtypes."""
    def f(c, x):
        full = jax.lax.all_gather(c, DATA_AXIS, tiled=True)
        return full[: x.size].reshape(x.shape).astype(x.dtype)
    return jax.tree.map(f, chunks, like)


def make_zero1_train_step(mesh, apply_fn, params, *, input_hw, target_hw,
                          si_lambda=0.5, augment=False,
                          resize_precision="highest", learning_rate=1e-4,
                          b1=0.9, b2=0.999, weight_decay=0.0,
                          clip_norm=1.0, grad_accum=1, ema_decay=0.0,
                          optimizer="adamw", loss_kind="si"):
    """Build jitted (init_fn, step_fn) for ZeRO-1 DP training over `mesh`.

    init_fn(params) -> opt_state with every Adam moment sharded over the
      data axis (this mesh-column's 1/N flat chunk; global view [N*chunk]).
    step_fn(params, opt_state, step, img_u8, depth, rng)
      -> (params, opt_state, step, metrics); params replicated in and out,
      batch arrays sharded over the data axis. With ema_decay > 0 the
      signature gains an `ema` pytree after `step` on both sides.

    Semantically equal (up to reduction order) to the replicated DP step
    with optax.chain(clip_by_global_norm, adamw): the clip is applied
    manually from a psum'd global norm because each device only sees its
    own disjoint gradient shard. `params` is used as the shape template
    for the sharded optimizer specs.

    grad_accum > 1 scans `grad_accum` device-local microbatches of the
    local shard (B_local/grad_accum each) before the single
    reduce_scatter + update — ZeRO-1's optimizer-memory sharding and
    grad_accum's activation-memory slicing compose: one collective round
    per optimizer step regardless of accum. Metrics are exact effective-
    batch values via summed sufficient statistics (losses.py), psum'd
    over the data axis.

    ema_decay > 0 maintains a Polyak average of the gathered full params
    (elementwise on the replicated copy every device already holds after
    the all_gather — no extra collective). The EMA tree is replicated,
    not chunk-sharded, so checkpoints interchange with the replicated
    trainer's ema_params layout.
    """
    n_dev = mesh.shape[DATA_AXIS]
    input_hw, target_hw = tuple(input_hw), tuple(target_hw)
    prec = (jax.lax.Precision.HIGHEST if resize_precision == "highest"
            else jax.lax.Precision.DEFAULT)
    # Inner optimizer WITHOUT the clip (handled explicitly) — all the
    # supported rules are elementwise, so running on flat chunks is exact.
    from ann3depth_tpu.train.step import make_inner_optimizer
    tx = make_inner_optimizer(learning_rate, optimizer, b1=b1, b2=b2,
                              weight_decay=weight_decay)
    stats_fn = lambda pred_log, depths: losses.depth_metric_stats(  # noqa: E731
        pred_log, depths, si_lambda=si_lambda, loss_kind=loss_kind)

    def per_device_init(params):
        idx = jax.lax.axis_index(DATA_AXIS)
        chunks = jax.tree.map(lambda p: _local_chunk(p, idx, n_dev), params)
        return tx.init(chunks)

    def _grads_and_stats(params, img_u8, depth_raw, step, rng):
        """Local-shard mean gradients + summed metric sufficient stats."""
        if augment:
            idx = jax.lax.axis_index(DATA_AXIS)
            key = jax.random.fold_in(jax.random.fold_in(rng, step), idx)
        else:
            key = None

        def loss_fn(p, images, depths):
            pred_log = apply_fn({"params": p}, images)
            return losses.depth_loss(pred_log, depths, kind=loss_kind,
                                     lam=si_lambda), pred_log

        def one(p, img, dep, key):
            images, depths = preprocess.preprocess_batch(
                img, dep, input_hw, target_hw, key=key,
                use_pallas=False, precision=prec)
            grads, pred_log = jax.grad(loss_fn, has_aux=True)(
                p, images, depths)
            return grads, stats_fn(pred_log, depths)

        if grad_accum == 1:
            return one(params, img_u8, depth_raw, key)

        # Microbatch split of the LOCAL shard (we are inside shard_map, so
        # any split is device-local) — the shared scan from train/step.py.
        return accumulate_microbatches(
            lambda img, dep, mkey: one(params, img, dep, mkey),
            img_u8, depth_raw, grad_accum=grad_accum, augment=augment,
            base_key=key, grads_like=params, stats_fn=stats_fn,
            target_hw=target_hw)

    def per_device_step(params, opt_state, step, *rest):
        if ema_decay > 0:
            ema, img_u8, depth_raw, rng = rest
        else:
            img_u8, depth_raw, rng = rest
        grads, stats = _grads_and_stats(params, img_u8, depth_raw, step, rng)

        # reduce_scatter: each device ends with the global-mean gradient
        # for its 1/N chunk of every leaf.
        gchunks = jax.tree.map(lambda g: _scatter_grad(g, n_dev), grads)

        # Global-norm clip across ALL shards and devices: the chunks are
        # disjoint, so local sumsq psum'd over the axis is the full ||g||².
        # clip_norm <= 0 disables clipping (matches make_optimizer).
        local_sq = sum(jnp.sum(jnp.square(c))
                       for c in jax.tree.leaves(gchunks))
        gnorm = jnp.sqrt(jax.lax.psum(local_sq, DATA_AXIS))
        if clip_norm > 0:
            scale = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
            gchunks = jax.tree.map(lambda c: c * scale, gchunks)

        # Sharded optimizer update on the chunks only (1/N state + FLOPs).
        idx = jax.lax.axis_index(DATA_AXIS)
        pchunks = jax.tree.map(lambda p: _local_chunk(p, idx, n_dev), params)
        updates, new_opt_state = tx.update(gchunks, opt_state, pchunks)
        new_chunks = optax.apply_updates(pchunks, updates)

        # all_gather the updated chunks back to full replicated params.
        new_params = _gather_params(new_chunks, params)

        # Exact effective-batch metrics: stats sum over devices (disjoint
        # shards), finalize once — dataset-grade RMSE, and the loss is the
        # global mean per-image Eigen loss, same as train/step.py.
        stats = jax.tree.map(lambda s: jax.lax.psum(s, DATA_AXIS), stats)
        fin = losses.finalize_depth_metrics(stats)
        metrics = {"loss": fin["loss"], "rmse": fin["rmse"],
                   "grad_norm": gnorm}
        if ema_decay > 0:
            new_ema = ema_update(ema, new_params, ema_decay)
            return new_params, new_opt_state, step + 1, new_ema, metrics
        return new_params, new_opt_state, step + 1, metrics

    # Sharding specs for the opt state: moment chunks live over "data"
    # (global view [N*chunk]); scalar counters replicated. Shapes come from
    # tx.init on per-device chunk templates (per_device_init itself needs
    # an axis context, so it can't be eval_shape'd directly).
    import math
    opt_shapes = jax.eval_shape(
        tx.init,
        jax.tree.map(lambda p: jax.ShapeDtypeStruct(
            (_chunk_size(math.prod(p.shape), n_dev),), jnp.float32),
            params))
    opt_specs = jax.tree.map(
        lambda s: P() if s.ndim == 0 else P(DATA_AXIS), opt_shapes)

    init_fn = jax.jit(jax.shard_map(
        per_device_init, mesh=mesh,
        in_specs=(P(),), out_specs=opt_specs, check_vma=False))

    if ema_decay > 0:
        in_specs = (P(), opt_specs, P(), P(), P(DATA_AXIS), P(DATA_AXIS),
                    P())
        out_specs = (P(), opt_specs, P(), P(), P())
        donate = (0, 1, 3)  # params, opt_state, ema
    else:
        in_specs = (P(), opt_specs, P(), P(DATA_AXIS), P(DATA_AXIS), P())
        out_specs = (P(), opt_specs, P(), P())
        donate = (0, 1)
    step_fn = jax.jit(jax.shard_map(
        per_device_step, mesh=mesh,
        in_specs=in_specs, out_specs=out_specs, check_vma=False,
    ), donate_argnums=donate)
    return init_fn, step_fn
