"""DPT stretch-model tests [B:11] — small configuration on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu.models.dpt import DPTDepthNet


@pytest.fixture(scope="module")
def tiny_dpt():
    model = DPTDepthNet(dim=64, depth=5, heads=2, fusion_features=32,
                        tap_layers=(1, 2, 3, 4), compute_dtype=jnp.float32,
                        remat=False)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    return model, params


def test_dpt_output_full_resolution(tiny_dpt):
    model, params = tiny_dpt
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 64, 64, 3)),
                    jnp.float32)
    y = model.apply({"params": params}, x)
    assert y.shape == (2, 64, 64, 1)
    assert y.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(y)))
    assert DPTDepthNet.output_hw((384, 384)) == (384, 384)


def test_dpt_head_stride4_full_resolution_out():
    """head_stride=4 keeps the head at gh*4 but still emits full-res
    depth (the bandwidth lever of benchmarks/exp_dpt_head_stride.py)."""
    model = DPTDepthNet(dim=64, depth=5, heads=2, fusion_features=32,
                        tap_layers=(1, 2, 3, 4), compute_dtype=jnp.float32,
                        remat=False, head_stride=4)
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (2, 64, 64, 3)),
                    jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape == (2, 64, 64, 1)
    assert np.all(np.isfinite(np.asarray(y)))


def test_dpt_gradients_flow(tiny_dpt):
    model, params = tiny_dpt
    x = jnp.ones((1, 64, 64, 3))

    def f(p):
        return jnp.mean(model.apply({"params": p}, x) ** 2)

    g = jax.grad(f)(params)
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    nonzero = sum(n > 0 for n in norms)
    assert nonzero >= len(norms) - 4  # pos_embed & taps all contribute


def test_dpt_registry_and_train_step():
    """DPT integrates with the generic train step (tiny shapes)."""
    from ann3depth_tpu.train import step as steplib

    model = DPTDepthNet(dim=32, depth=5, heads=2, fusion_features=16,
                        tap_layers=(1, 2, 3, 4), compute_dtype=jnp.float32,
                        remat=False)
    params = steplib.init_params(model, (32, 32))
    tx = steplib.make_optimizer(1e-4)
    state = steplib.TrainState.create(model.apply, params, tx)
    rng_np = np.random.default_rng(0)
    img = jnp.asarray(rng_np.integers(0, 256, (2, 40, 40, 3), dtype=np.uint8))
    dep = jnp.asarray(rng_np.uniform(1, 50, (2, 20, 20)).astype(np.float32))
    state, metrics = steplib.train_step(
        state, img, dep, jax.random.key(0),
        input_hw=(32, 32), target_hw=(32, 32), augment=True)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
