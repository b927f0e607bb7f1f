"""ZeRO-1 sharded-optimizer DP step (parallel/zero1.py) on the fake mesh:
equals replicated-optimizer DP up to reduction order, and the Adam moments
are actually sharded over the data axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu.config import ModelConfig
from ann3depth_tpu.models import registry
from ann3depth_tpu.parallel import mesh as meshlib
from ann3depth_tpu.parallel import zero1
from ann3depth_tpu.train import step as steplib


def _setup(batch, input_hw=(48, 64), target_hw=(24, 32)):
    model = registry.build(ModelConfig(name="encdec", compute_dtype="float32"))
    params = steplib.init_params(model, input_hw, seed=0)
    rng_np = np.random.default_rng(0)
    img = rng_np.integers(0, 256, (batch, 56, 72, 3), dtype=np.uint8)
    dep = rng_np.uniform(1.0, 50.0, (batch, 28, 36)).astype(np.float32)
    return model, params, img, dep, dict(input_hw=input_hw,
                                         target_hw=target_hw)


@pytest.mark.slow
def test_zero1_matches_replicated_dp(cpu_mesh):
    """3 ZeRO-1 steps == 3 replicated-DP steps (same clip+adamw semantics,
    tolerance: f32 reduction reassociation through scatter/gather)."""
    batch = 16
    lr = 1e-3
    model, params, img, dep, hw = _setup(batch)
    rng = jax.random.key(0)

    with jax.default_matmul_precision("highest"):
        # Reference: replicated optimizer (chain(clip, adamw) in step.py).
        tx = steplib.make_optimizer(lr)
        state = steplib.TrainState.create(model.apply,
                                          jax.tree.map(jnp.copy, params), tx)
        state = meshlib.replicate(state, cpu_mesh)
        sh = meshlib.shard_batch({"i": img, "d": dep}, cpu_mesh)
        rng_r = jax.device_put(rng, meshlib.replicated(cpu_mesh))
        kw = dict(**hw, si_lambda=0.5, augment=False,
                  resize_precision="highest")
        for _ in range(3):
            state, m_ref = steplib.train_step(state, sh["i"], sh["d"],
                                              rng_r, **kw)

        # ZeRO-1: sharded optimizer, explicit collectives.
        init_fn, step_fn = zero1.make_zero1_train_step(
            cpu_mesh, model.apply, params, **hw, si_lambda=0.5,
            augment=False, resize_precision="highest", learning_rate=lr,
            clip_norm=1.0, weight_decay=0.0)
        p = meshlib.replicate(params, cpu_mesh)
        opt = init_fn(p)
        step_no = jax.device_put(jnp.zeros((), jnp.int32),
                                 meshlib.replicated(cpu_mesh))
        for _ in range(3):
            p, opt, step_no, m_z = step_fn(p, opt, step_no, sh["i"],
                                           sh["d"], rng_r)

    assert float(m_ref["loss"]) == pytest.approx(float(m_z["loss"]),
                                                 rel=1e-4)
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(p))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-3)
    assert int(step_no) == 3


def test_zero1_opt_state_is_sharded(cpu_mesh):
    """Adam moment leaves live over the data axis with 1/N per device."""
    model, params, img, dep, hw = _setup(8)
    init_fn, _ = zero1.make_zero1_train_step(
        cpu_mesh, model.apply, params, **hw)
    p = meshlib.replicate(params, cpu_mesh)
    opt = init_fn(p)

    n_dev = cpu_mesh.devices.size
    moment_leaves = [l for l in jax.tree.leaves(opt) if l.ndim > 0]
    assert moment_leaves, "no sharded moment leaves found"
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    for leaf in moment_leaves:
        assert "data" in str(leaf.sharding.spec)
        # global moment vector is the padded flat param count
        local = leaf.addressable_shards[0].data.shape[0]
        assert local * n_dev == leaf.shape[0]
    total_moment = sum(int(l.shape[0]) for l in moment_leaves)
    # mu + nu for every param element (each padded to chunk multiples)
    assert total_moment >= 2 * n_params
    assert total_moment <= 2 * (n_params + len(moment_leaves) * n_dev)


@pytest.mark.slow
def test_zero1_grad_accum_matches_full_batch(cpu_mesh):
    """zero1 grad_accum=2 == zero1 accum=1 on the same global batch (one
    optimizer update from scanned device-local microbatches; equal up to
    f32 reassociation of the gradient sums)."""
    batch = 16
    model, params, img, dep, hw = _setup(batch)
    rng = jax.random.key(0)
    sh = meshlib.shard_batch({"i": img, "d": dep}, cpu_mesh)
    rng_r = jax.device_put(rng, meshlib.replicated(cpu_mesh))

    with jax.default_matmul_precision("highest"):
        results = {}
        for accum in (1, 2):
            init_fn, step_fn = zero1.make_zero1_train_step(
                cpu_mesh, model.apply, params, **hw, si_lambda=0.5,
                augment=False, resize_precision="highest",
                learning_rate=1e-3, grad_accum=accum)
            p = meshlib.replicate(jax.tree.map(jnp.copy, params), cpu_mesh)
            opt = init_fn(p)
            step_no = jax.device_put(jnp.zeros((), jnp.int32),
                                     meshlib.replicated(cpu_mesh))
            for _ in range(2):
                p, opt, step_no, m = step_fn(p, opt, step_no, sh["i"],
                                             sh["d"], rng_r)
            results[accum] = (jax.device_get(p), jax.device_get(m))

    (p1, m1), (p2, m2) = results[1], results[2]
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    assert float(m1["rmse"]) == pytest.approx(float(m2["rmse"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-3)


@pytest.mark.slow
def test_zero1_ema_matches_replicated_ema(cpu_mesh):
    """zero1 ema_decay == the replicated step's EMA over the same
    trajectory: both Polyak-average the post-update params."""
    batch = 8
    decay = 0.9
    model, params, img, dep, hw = _setup(batch)
    rng = jax.random.key(0)
    sh = meshlib.shard_batch({"i": img, "d": dep}, cpu_mesh)
    rng_r = jax.device_put(rng, meshlib.replicated(cpu_mesh))

    with jax.default_matmul_precision("highest"):
        # Reference: replicated step with in-step EMA.
        tx = steplib.make_optimizer(1e-3)
        state = steplib.TrainState.create(
            model.apply, jax.tree.map(jnp.copy, params), tx, ema=True)
        state = meshlib.replicate(state, cpu_mesh)
        kw = dict(**hw, si_lambda=0.5, augment=False,
                  resize_precision="highest", ema_decay=decay)
        for _ in range(3):
            state, _ = steplib.train_step(state, sh["i"], sh["d"],
                                          rng_r, **kw)

        init_fn, step_fn = zero1.make_zero1_train_step(
            cpu_mesh, model.apply, params, **hw, si_lambda=0.5,
            augment=False, resize_precision="highest", learning_rate=1e-3,
            ema_decay=decay)
        p = meshlib.replicate(jax.tree.map(jnp.copy, params), cpu_mesh)
        ema = meshlib.replicate(jax.tree.map(jnp.copy, params), cpu_mesh)
        opt = init_fn(p)
        step_no = jax.device_put(jnp.zeros((), jnp.int32),
                                 meshlib.replicated(cpu_mesh))
        for _ in range(3):
            p, opt, step_no, ema, _ = step_fn(p, opt, step_no, ema,
                                              sh["i"], sh["d"], rng_r)

    for a, b in zip(jax.tree.leaves(jax.device_get(state.ema_params)),
                    jax.tree.leaves(jax.device_get(ema))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-3)


@pytest.mark.slow
def test_zero1_sgd_matches_replicated(cpu_mesh):
    """--optimizer sgd through both trainers: the shared inner-optimizer
    (steplib.make_inner_optimizer) is elementwise, so the ZeRO-1
    flat-chunk update equals the replicated one for SGD too."""
    batch = 8
    model, params, img, dep, hw = _setup(batch)
    rng = jax.random.key(0)
    sh = meshlib.shard_batch({"i": img, "d": dep}, cpu_mesh)
    rng_r = jax.device_put(rng, meshlib.replicated(cpu_mesh))

    with jax.default_matmul_precision("highest"):
        tx = steplib.make_optimizer(1e-3, optimizer="sgd")
        state = steplib.TrainState.create(model.apply,
                                          jax.tree.map(jnp.copy, params), tx)
        state = meshlib.replicate(state, cpu_mesh)
        kw = dict(**hw, si_lambda=0.5, augment=False,
                  resize_precision="highest")
        for _ in range(2):
            state, m_ref = steplib.train_step(state, sh["i"], sh["d"],
                                              rng_r, **kw)

        init_fn, step_fn = zero1.make_zero1_train_step(
            cpu_mesh, model.apply, params, **hw, si_lambda=0.5,
            augment=False, resize_precision="highest", learning_rate=1e-3,
            optimizer="sgd")
        p = meshlib.replicate(jax.tree.map(jnp.copy, params), cpu_mesh)
        opt = init_fn(p)
        step_no = jax.device_put(jnp.zeros((), jnp.int32),
                                 meshlib.replicated(cpu_mesh))
        for _ in range(2):
            p, opt, step_no, m_z = step_fn(p, opt, step_no, sh["i"],
                                           sh["d"], rng_r)

    assert float(m_ref["loss"]) == pytest.approx(float(m_z["loss"]),
                                                 rel=1e-4)
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(p))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-3)
