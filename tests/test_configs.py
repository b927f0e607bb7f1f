"""Config-preset traceability tests: each BASELINE.json config [B:7-11]
resolves, builds its model, and (config 1) runs its exact shape contract."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu.config import PRESETS, get_config
from ann3depth_tpu.models import registry
from ann3depth_tpu.train import loop as looplib
from ann3depth_tpu.train import step as steplib


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_resolves_and_builds(name):
    cfg = get_config(name)
    model = registry.build(cfg.model)
    assert model is not None
    # target resolution derives from the model's output stride
    th, tw = looplib.resolved_target_hw(cfg)
    assert th > 0 and tw > 0


def test_unknown_preset_raises():
    with pytest.raises(KeyError, match="unknown config"):
        get_config("nope")


def test_config1_small_batch1_cpu_full_res():
    """[B:7]: single 320x240 image -> 3-conv net, batch=1 — exact shapes,
    full train step on CPU."""
    cfg = get_config("make3d-small")
    assert cfg.train.batch_size == 1
    assert cfg.data.input_hw == (240, 320)
    model = registry.build(cfg.model)
    params = steplib.init_params(model, cfg.data.input_hw)
    tx = steplib.make_optimizer(1e-3)
    state = steplib.TrainState.create(model.apply, params, tx)
    rng_np = np.random.default_rng(0)
    img = jnp.asarray(rng_np.integers(0, 256, (1, 480, 640, 3), dtype=np.uint8))
    dep = jnp.asarray(rng_np.uniform(1, 60, (1, 305, 55)).astype(np.float32))
    state, m = steplib.train_step(
        state, img, dep, jax.random.key(0),
        input_hw=cfg.data.input_hw,
        target_hw=looplib.resolved_target_hw(cfg), augment=False)
    assert np.isfinite(float(m["loss"]))
    # coarse head: 320x240 -> 40x30 [B:7 "coarse depth"]
    assert looplib.resolved_target_hw(cfg) == (30, 40)


def test_dpt_preset_shape_and_remat_default():
    cfg = get_config("dpt-384")
    # remat off by default: fits HBM at b8 and measured faster (config.py)
    assert cfg.model.remat is False
    assert cfg.data.input_hw == (384, 384)


def test_best_and_throughput_presets():
    """r4 presets encode BASELINE.md's measured recommendations: the
    quality-lever stack (w2 x augment x si+grad at w2's b64 peak) and the
    b128 tiling sweet spot that previously lived only in prose."""
    best = get_config("encdec-w2-best")
    assert best.model.width_mult == 2.0
    assert best.data.augment is True
    assert best.train.loss == "si+grad"
    assert best.train.batch_size == 64

    b128 = get_config("encdec-b128")
    assert b128.train.batch_size == 128
    assert b128.model.width_mult == 1.0  # parity-width model

    dpt_best = get_config("dpt-384-best")
    assert dpt_best.model.name == "dpt"
    assert dpt_best.train.loss == "si+grad"
    assert dpt_best.data.augment is False  # didn't compose at 2500 steps
    assert dpt_best.train.batch_size == 16


def test_cli_preprocess_impl_flag():
    from ann3depth_tpu.cli import build_parser, _resolve

    args = build_parser().parse_args(
        ["train", "--config", "smoke", "--preprocess-impl", "pallas"])
    cfg = _resolve(args)
    assert cfg.data.preprocess_impl == "pallas"


def test_cli_optimizer_hyperparameter_flags():
    """r3: the AdamW surface (warmup/decay/clip/betas) is reachable from
    the CLI and lands in TrainConfig for both optimizer paths."""
    from ann3depth_tpu.cli import build_parser, _resolve

    args = build_parser().parse_args(
        ["train", "--config", "smoke", "--warmup-steps", "7",
         "--weight-decay", "0.01", "--clip-norm", "2.5",
         "--adam-b1", "0.85", "--adam-b2", "0.97"])
    cfg = _resolve(args)
    assert cfg.train.warmup_steps == 7
    assert cfg.train.weight_decay == 0.01
    assert cfg.train.clip_norm == 2.5
    assert cfg.train.adam_b1 == 0.85
    assert cfg.train.adam_b2 == 0.97
    # defaults stay put when flags are absent
    args = build_parser().parse_args(["train", "--config", "smoke"])
    cfg = _resolve(args)
    assert cfg.train.adam_b1 == 0.9 and cfg.train.clip_norm == 1.0


def test_cli_optimizer_choice_resolves():
    from ann3depth_tpu.cli import build_parser, _resolve

    args = build_parser().parse_args(
        ["train", "--config", "smoke", "--optimizer", "sgd"])
    assert _resolve(args).train.optimizer == "sgd"
    assert (_resolve(build_parser().parse_args(
        ["train", "--config", "smoke"])).train.optimizer == "adamw")


def test_make_inner_optimizer_variants():
    import jax
    import jax.numpy as jnp
    import optax

    from ann3depth_tpu.train import step as steplib

    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.full((3,), 0.5)}
    for name, decay in (("adamw", 0.01), ("adam", 0.0), ("sgd", 0.01)):
        tx = steplib.make_inner_optimizer(1e-2, name, weight_decay=decay)
        upd, _ = tx.update(grads, tx.init(params), params)
        new = optax.apply_updates(params, upd)
        assert float(jnp.max(jnp.abs(new["w"] - params["w"]))) > 1e-5, name
    import pytest
    with pytest.raises(ValueError, match="unknown optimizer"):
        steplib.make_inner_optimizer(1e-2, "rmsprop")
    # Plain Adam has no weight decay; silently dropping a user-supplied
    # --weight-decay would train unregularized while claiming otherwise.
    with pytest.raises(ValueError, match="weight decay"):
        steplib.make_inner_optimizer(1e-2, "adam", weight_decay=0.01)


def test_schedule_constant_and_cli():
    import pytest

    from ann3depth_tpu.cli import build_parser, _resolve
    from ann3depth_tpu.train import step as steplib

    sched = steplib.make_schedule(1e-3, warmup_steps=10, total_steps=1000,
                                  schedule="constant")
    assert float(sched(0)) == pytest.approx(0.0, abs=1e-9)   # warming up
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-6)
    assert float(sched(999)) == pytest.approx(1e-3, rel=1e-6)  # stays flat
    assert steplib.make_schedule(1e-3, schedule="constant") == 1e-3
    with pytest.raises(ValueError, match="unknown schedule"):
        steplib.make_schedule(1e-3, schedule="linear")

    args = build_parser().parse_args(
        ["train", "--config", "smoke", "--schedule", "constant"])
    assert _resolve(args).train.schedule == "constant"
