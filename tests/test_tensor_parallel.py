"""Tensor-parallel sharding rules for the DPT transformer (SURVEY §2.3 TP
row): dp x tp on the fake 8-device mesh matches single-device training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu.models.dpt import DPTDepthNet
from ann3depth_tpu.parallel import mesh as meshlib
from ann3depth_tpu.parallel import sharding_rules as rules
from ann3depth_tpu.train import step as steplib


def _tiny_dpt():
    model = DPTDepthNet(dim=64, depth=5, heads=2, fusion_features=32,
                        tap_layers=(1, 2, 3, 4), compute_dtype=jnp.float32,
                        remat=False)
    params = steplib.init_params(model, (32, 32), seed=0)
    return model, params


def test_tp_rules_match_expected_params():
    model, params = _tiny_dpt()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    matched = {rules._path_str(p): rules.tp_spec_for(rules._path_str(p), l.ndim)
               for p, l in flat}
    hits = {p: s for p, s in matched.items() if s is not None}
    # every block contributes q/k/v/out + 2 MLP kernels (+biases)
    assert any("query/kernel" in p for p in hits)
    assert any("MLP_0/Dense_0/kernel" in p for p in hits)
    # conv params never match
    assert not any("patch_embed" in p for p in hits)
    assert not any("fuse" in p for p in hits)


@pytest.mark.slow
def test_dp_tp_matches_single_device(cpu_mesh):
    model, params0 = _tiny_dpt()
    tx = steplib.make_optimizer(1e-3)
    rng = jax.random.key(0)
    rng_np = np.random.default_rng(0)
    batch = 8
    img = rng_np.integers(0, 256, (batch, 40, 40, 3), dtype=np.uint8)
    dep = rng_np.uniform(1.0, 50.0, (batch, 20, 20)).astype(np.float32)
    # resize_precision "highest": truncated-f32 dots tile differently under
    # partitioning (cf. test_parallel), breaking the equality this asserts.
    kw = dict(input_hw=(32, 32), target_hw=(32, 32), si_lambda=0.5,
              augment=False, resize_precision="highest")

    with jax.default_matmul_precision("highest"):
        # single device
        state1 = steplib.TrainState.create(
            model.apply, jax.tree.map(jnp.copy, params0), tx)
        s1, m1 = steplib.train_step(state1, img, dep, rng, **kw)

        # dp(4) x tp(2)
        mesh = meshlib.create_mesh_2d(4, 2, list(cpu_mesh.devices.flat))
        params = rules.shard_params(params0, mesh, tensor_parallel=True)
        state2 = steplib.TrainState.create(model.apply, params, tx)
        batch_dev = meshlib.shard_batch({"i": img, "d": dep}, mesh)
        rng_r = jax.device_put(rng, meshlib.replicated(mesh))
        s2, m2 = steplib.train_step(state2, batch_dev["i"], batch_dev["d"],
                                    rng_r, **kw)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-4)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(jax.device_get(s2.params))
    # atol 2e-3: Adam's rsqrt(v)+eps at step 1 amplifies tiny collective
    # reduction-order differences in near-zero gradients (cf. test_parallel).
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-3)


def test_shard_params_tp_places_on_model_axis(cpu_mesh):
    model, params = _tiny_dpt()
    mesh = meshlib.create_mesh_2d(4, 2, list(cpu_mesh.devices.flat))
    sharded = rules.shard_params(params, mesh, tensor_parallel=True)
    desc = rules.describe_sharding(sharded)
    q = [v for k, v in desc.items() if "query/kernel" in k]
    assert q and all("model" in v for v in q)
    conv = [v for k, v in desc.items() if "patch_embed" in k]
    assert conv and all("model" not in v for v in conv)


@pytest.mark.slow
def test_loop_level_tensor_parallel_cli_surface(tmp_path, cpu_mesh):
    """r3: --tp from config through the loop — the trainer builds the
    dp x tp mesh itself, create_state TP-shards the dpt-small params
    (moments/EMA inherit the shardings), training runs, resume restores
    the sharded layout, and CLI eval restores params onto its own mesh."""
    import dataclasses

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, datasets=("synthetic",),
                                 input_hw=(32, 32)),
        model=dataclasses.replace(cfg.model, name="dpt-small",
                                  compute_dtype="float32"),
        train=dataclasses.replace(cfg.train, batch_size=8, steps=3,
                                  tensor_parallel=2, ema_decay=0.9,
                                  ckpt_dir=str(tmp_path / "ckpt"),
                                  checkpoint_every=3, log_every=2,
                                  eval_every=2),
    )
    state, metrics = looplib.train(cfg, workdir=str(tmp_path),
                                   progress=False)
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["loss"]))
    # q/k/v kernels actually sharded over the model axis
    desc = rules.describe_sharding(state.params)
    q = [v for k, v in desc.items() if "query/kernel" in k]
    assert q and all("model" in v for v in q)
    # Adam moments inherited the TP shardings (not replicated)
    mdesc = rules.describe_sharding(state.opt_state)
    assert any("model" in v for v in mdesc.values())
    # EMA rode along sharded
    edesc = rules.describe_sharding(state.ema_params)
    assert any("model" in v for v in edesc.values())

    # resume round-trips the sharded layout
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps=5, resume=True))
    state2, _ = looplib.train(cfg2, workdir=str(tmp_path), progress=False)
    assert int(state2.step) == 5

    # serving-side eval restores params-only onto its own (1-D) mesh
    em = looplib.evaluate(cfg2, max_batches=2)
    assert np.isfinite(em["rmse"]) and em["rmse"] > 0


@pytest.mark.slow
def test_tp_composes_with_grad_accum(tmp_path, cpu_mesh):
    """--tp 2 --grad-accum 2: the microbatch shards over the data axis of
    the dp x tp mesh while the scan accumulates; one composed jitted
    step."""
    import dataclasses

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, datasets=("synthetic",),
                                 input_hw=(32, 32)),
        model=dataclasses.replace(cfg.model, name="dpt-small",
                                  compute_dtype="float32"),
        train=dataclasses.replace(cfg.train, batch_size=8, steps=2,
                                  grad_accum=2, tensor_parallel=2,
                                  ckpt_dir=str(tmp_path / "ckpt"),
                                  checkpoint_every=10, log_every=1,
                                  eval_every=0),
    )
    state, metrics = looplib.train(cfg, workdir=str(tmp_path),
                                   progress=False)
    assert int(state.step) == 2
    assert np.isfinite(float(metrics["loss"]))
    desc = rules.describe_sharding(state.params)
    assert any("model" in v for k, v in desc.items() if "query/kernel" in k)


def test_tp_rejects_non_dpt_models(tmp_path):
    import dataclasses

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")  # model "small"
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, tensor_parallel=2))
    with pytest.raises(ValueError, match="dpt-family"):
        looplib.train(cfg, workdir=str(tmp_path))


def test_tp_rejects_nonpositive(tmp_path):
    """--tp 0 must fail loudly, not silently train un-sharded."""
    import dataclasses

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, tensor_parallel=0))
    with pytest.raises(ValueError, match="tensor_parallel must be >= 1"):
        looplib.train(cfg, workdir=str(tmp_path))


def test_auto_data_mesh_tp(cpu_mesh):
    """auto_data_mesh(unit, tp=N): dp x tp mesh, data axis shrunk to the
    widest divisor of the microbatch (shared policy — loop.py consumes
    this instead of its own copy)."""
    mesh = meshlib.auto_data_mesh(8, tp=2)
    assert mesh.shape["model"] == 2 and mesh.shape["data"] == 4
    mesh = meshlib.auto_data_mesh(6, tp=2)   # 4 -> widest divisor 3
    assert mesh.shape["model"] == 2 and mesh.shape["data"] == 3
    with pytest.raises(ValueError, match="not divisible"):
        meshlib.auto_data_mesh(8, tp=3)      # 8 devices % 3 != 0


def test_cli_tp_flag_resolves():
    from ann3depth_tpu.cli import build_parser, _resolve

    args = build_parser().parse_args(
        ["train", "--config", "dpt-384", "--tp", "4"])
    assert _resolve(args).train.tensor_parallel == 4
    args = build_parser().parse_args(["train", "--config", "dpt-384"])
    assert _resolve(args).train.tensor_parallel == 1
