"""Data-parallel correctness on the 8-device fake CPU mesh (SURVEY §4.6):
DP training over the mesh equals single-device training up to reduction
order, and the graft entry points work."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu.config import ModelConfig
from ann3depth_tpu.models import registry
from ann3depth_tpu.parallel import mesh as meshlib
from ann3depth_tpu.train import step as steplib


def _setup(batch, input_hw=(48, 64), target_hw=(24, 32)):
    model = registry.build(ModelConfig(name="encdec", compute_dtype="float32"))
    params = steplib.init_params(model, input_hw, seed=0)
    tx = steplib.make_optimizer(1e-3)
    state = steplib.TrainState.create(model.apply, params, tx)
    rng_np = np.random.default_rng(0)
    img = rng_np.integers(0, 256, (batch, 56, 72, 3), dtype=np.uint8)
    dep = rng_np.uniform(1.0, 50.0, (batch, 28, 36)).astype(np.float32)
    # resize_precision "highest": truncated-f32 dots tile differently under
    # partitioning, so the DP == single-device equality needs exact f32.
    kw = dict(input_hw=input_hw, target_hw=target_hw, si_lambda=0.5,
              augment=False, resize_precision="highest")
    return state, img, dep, kw


def test_mesh_has_8_fake_devices(cpu_mesh):
    assert cpu_mesh.devices.size == 8


@pytest.mark.slow
def test_dp_matches_single_device(cpu_mesh):
    """One DP step over 8 devices == one single-device step (tolerance:
    f32 reduction reassociation)."""
    batch = 16
    state, img, dep, kw = _setup(batch)
    rng = jax.random.key(0)

    # HIGHEST matmul precision: XLA's default truncates f32 dot operands,
    # and the truncation pattern differs with partitioning — with exact f32
    # the two programs differ only by reduction order.
    with jax.default_matmul_precision("highest"):
        # single device (device 0 of the mesh); train_step donates its
        # state, so keep an unshared copy for the DP run below.
        state_copy = jax.tree.map(jnp.copy, state)
        s1, m1 = steplib.train_step(state, img, dep, rng, **kw)

        # DP over the mesh
        state_r = meshlib.replicate(state_copy, cpu_mesh)
        batch_sh = meshlib.shard_batch({"i": img, "d": dep}, cpu_mesh)
        rng_r = jax.device_put(rng, meshlib.replicated(cpu_mesh))
        s8, m8 = steplib.train_step(state_r, batch_sh["i"], batch_sh["d"],
                                    rng_r, **kw)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-4)
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(jax.device_get(s8.params))
    # atol 2e-4: Adam's rsqrt(v)+eps at step 1 amplifies reduction-order
    # noise in near-zero gradients; params are O(0.1).
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=2e-4)


def test_shard_batch_rejects_indivisible(cpu_mesh):
    with pytest.raises(ValueError, match="not divisible"):
        meshlib.shard_batch({"x": np.zeros((3, 4))}, cpu_mesh)


def test_shard_batch_2d_mesh_divides_by_data_axis_only():
    """On a dp x tp mesh only the data axis splits the batch: batch=2 on a
    2x4 mesh must shard (2 % 2 == 0) even though 2 % 8 != 0."""
    mesh = meshlib.create_mesh_2d(2, 4, jax.devices("cpu"))
    y = meshlib.shard_batch({"x": np.zeros((2, 4), np.float32)}, mesh)["x"]
    assert y.addressable_shards[0].data.shape == (1, 4)
    with pytest.raises(ValueError, match="not divisible"):
        meshlib.shard_batch({"x": np.zeros((3, 4))}, mesh)


def test_batch_actually_sharded(cpu_mesh):
    x = np.zeros((16, 8), np.float32)
    y = meshlib.shard_batch({"x": x}, cpu_mesh)["x"]
    assert len(y.sharding.device_set) == 8
    # each device holds 2 rows
    assert y.addressable_shards[0].data.shape == (2, 8)


@pytest.mark.slow
def test_shard_map_step_matches_propagation_path(cpu_mesh):
    """The explicit-collective shard_map step (parallel/shard_step.py)
    equals the sharding-propagation step up to reduction order: same
    batch, same replicated state, one step each."""
    from ann3depth_tpu.parallel import shard_step as smlib

    batch = 16
    state, img, dep, kw = _setup(batch)
    rng = jax.random.key(0)

    with jax.default_matmul_precision("highest"):
        state_a = meshlib.replicate(jax.tree.map(jnp.copy, state), cpu_mesh)
        state_b = meshlib.replicate(state, cpu_mesh)
        sh = meshlib.shard_batch({"i": img, "d": dep}, cpu_mesh)
        rng_r = jax.device_put(rng, meshlib.replicated(cpu_mesh))

        s1, m1 = steplib.train_step(state_a, sh["i"], sh["d"], rng_r, **kw)

        step_fn = smlib.make_dp_train_step(
            cpu_mesh, input_hw=kw["input_hw"], target_hw=kw["target_hw"],
            si_lambda=kw["si_lambda"], augment=False,
            resize_precision="highest")
        s2, m2 = step_fn(state_b, sh["i"], sh["d"], rng_r)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=2e-4)


def test_graft_entry_single():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[1].shape[0] and out.ndim == 4


@pytest.mark.slow
@pytest.mark.parametrize("n", [8, 16])
def test_graft_dryrun_multichip(n):
    """Hermetic driver check: jax is already imported under pytest, so this
    exercises the subprocess fallback — the exact path the driver takes
    (the axon sitecustomize preloads jax in every interpreter). n=16
    rehearses mesh shapes beyond the 8-device conftest mesh (dp 16,
    dp8 x tp2, dp4 x tp4)."""
    import __graft_entry__ as g

    g.dryrun_multichip(n)
