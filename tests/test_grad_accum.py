"""Gradient accumulation (train_step grad_accum>1): one jitted scan over
microbatches == one full-batch step, up to f32 reassociation; interleaved
microbatching stays local under DP sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu.config import ModelConfig, get_config
from ann3depth_tpu.models import registry
from ann3depth_tpu.parallel import mesh as meshlib
from ann3depth_tpu.train import step as steplib


def _setup(batch, input_hw=(48, 64), target_hw=(24, 32), seed=0):
    model = registry.build(ModelConfig(name="encdec", compute_dtype="float32"))
    params = steplib.init_params(model, input_hw, seed=0)
    tx = steplib.make_optimizer(1e-3)
    state = steplib.TrainState.create(model.apply, params, tx)
    rng_np = np.random.default_rng(seed)
    img = rng_np.integers(0, 256, (batch, 56, 72, 3), dtype=np.uint8)
    dep = rng_np.uniform(1.0, 50.0, (batch, 28, 36)).astype(np.float32)
    kw = dict(input_hw=input_hw, target_hw=target_hw, si_lambda=0.5,
              augment=False, resize_precision="highest")
    return state, img, dep, kw


def test_microbatch_split_is_strided():
    x = np.arange(12).reshape(12, 1)
    out = np.asarray(steplib._to_microbatches(jnp.asarray(x), 3))
    # microbatch j = x[j::3] (device-local under "data" sharding)
    np.testing.assert_array_equal(out[0, :, 0], [0, 3, 6, 9])
    np.testing.assert_array_equal(out[1, :, 0], [1, 4, 7, 10])


def test_grad_accum_matches_full_batch():
    """3 steps at accum=4 == 3 full-batch steps: same params + metrics."""
    batch = 8
    state_a, img, dep, kw = _setup(batch)
    state_b = jax.tree.map(jnp.copy, state_a)

    with jax.default_matmul_precision("highest"):
        for _ in range(3):
            state_a, ma = steplib.train_step(state_a, img, dep,
                                             jax.random.key(0), **kw)
        for _ in range(3):
            state_b, mb = steplib.train_step(state_b, img, dep,
                                             jax.random.key(0),
                                             grad_accum=4, **kw)

    assert float(ma["loss"]) == pytest.approx(float(mb["loss"]), rel=1e-5)
    assert float(ma["rmse"]) == pytest.approx(float(mb["rmse"]), rel=1e-5)
    assert float(ma["grad_norm"]) == pytest.approx(float(mb["grad_norm"]),
                                                   rel=1e-4)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=2e-4)


@pytest.mark.slow
def test_grad_accum_dp_matches_single_device(cpu_mesh):
    """accum=2 over the 8-device mesh == full-batch single-device step
    (microbatch 16 shards 8 ways; interleaved split keeps shards local)."""
    batch = 32
    state, img, dep, kw = _setup(batch)
    rng = jax.random.key(0)

    with jax.default_matmul_precision("highest"):
        state_copy = jax.tree.map(jnp.copy, state)
        s1, m1 = steplib.train_step(state, img, dep, rng, **kw)

        state_r = meshlib.replicate(state_copy, cpu_mesh)
        batch_sh = meshlib.shard_batch({"i": img, "d": dep}, cpu_mesh)
        rng_r = jax.device_put(rng, meshlib.replicated(cpu_mesh))
        s8, m8 = steplib.train_step(state_r, batch_sh["i"], batch_sh["d"],
                                    rng_r, grad_accum=2, **kw)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params),
                    jax.tree.leaves(jax.device_get(s8.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=2e-4)


def test_grad_accum_augment_runs():
    """augment + accum: per-microbatch PRNG keys, finite loss."""
    state, img, dep, kw = _setup(4)
    kw = {**kw, "augment": True}
    state, m = steplib.train_step(state, img, dep, jax.random.key(0),
                                  grad_accum=2, **kw)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_grad_accum_rejects_indivisible_batch():
    state, img, dep, kw = _setup(6)
    with pytest.raises(ValueError, match="not divisible"):
        steplib.train_step(state, img, dep, jax.random.key(0),
                           grad_accum=4, **kw)


def test_loop_validates_grad_accum():
    from ann3depth_tpu.train import loop

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=3, grad_accum=2))
    with pytest.raises(ValueError, match="grad_accum"):
        loop.train(cfg, workdir="/tmp/ga_reject")


def test_loop_trains_with_grad_accum(tmp_path):
    """End-to-end smoke: the loop threads grad_accum into the jitted step."""
    from ann3depth_tpu.train import loop

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, batch_size=4, grad_accum=2,
                                  steps=3, ckpt_dir=str(tmp_path / "ckpt"),
                                  checkpoint_every=3, log_every=1),
    )
    state, metrics = loop.train(cfg, workdir=str(tmp_path), progress=False)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 3
