"""EMA (Polyak-averaged) params: in-step update math, checkpoint
round-trip, and the eval --ema path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu.config import get_config
from ann3depth_tpu.models import registry
from ann3depth_tpu.train import step as steplib


def _setup(ema):
    from ann3depth_tpu.config import ModelConfig

    model = registry.build(ModelConfig(name="small", compute_dtype="float32"))
    params = steplib.init_params(model, (48, 64), seed=0)
    tx = steplib.make_optimizer(1e-2)
    state = steplib.TrainState.create(model.apply, params, tx, ema=ema)
    rng_np = np.random.default_rng(0)
    img = rng_np.integers(0, 256, (2, 56, 72, 3), dtype=np.uint8)
    dep = rng_np.uniform(1.0, 50.0, (2, 28, 36)).astype(np.float32)
    kw = dict(input_hw=(48, 64), target_hw=(6, 8), si_lambda=0.5)
    return state, img, dep, kw


def test_ema_follows_recursion():
    """ema_t = d*ema_{t-1} + (1-d)*params_t, starting from params_0."""
    d = 0.5
    state, img, dep, kw = _setup(ema=True)
    expected = jax.tree.map(np.asarray, state.params)
    for _ in range(3):
        state, _ = steplib.train_step(state, img, dep, jax.random.key(0),
                                      ema_decay=d, **kw)
        expected = jax.tree.map(
            lambda e, p: d * e + (1 - d) * np.asarray(p),
            expected, state.params)
    for a, b in zip(jax.tree.leaves(expected),
                    jax.tree.leaves(state.ema_params)):
        np.testing.assert_allclose(np.asarray(b), a, rtol=1e-6, atol=1e-7)
    # EMA trails the live params (they moved; the average lags)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(state.params),
                             jax.tree.leaves(state.ema_params))]
    assert max(diffs) > 0


def test_ema_disabled_stays_none():
    state, img, dep, kw = _setup(ema=False)
    state, _ = steplib.train_step(state, img, dep, jax.random.key(0), **kw)
    assert state.ema_params is None


def test_ema_with_grad_accum():
    state, img, dep, kw = _setup(ema=True)
    state, m = steplib.train_step(state, img, dep, jax.random.key(0),
                                  grad_accum=2, ema_decay=0.9, **kw)
    assert state.ema_params is not None
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_ema_checkpoint_roundtrip_and_eval(tmp_path):
    from ann3depth_tpu.train import loop

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, batch_size=4, steps=5, ema_decay=0.8,
            ckpt_dir=str(tmp_path / "ckpt"), checkpoint_every=5,
            eval_every=0))
    state, _ = loop.train(cfg, workdir=str(tmp_path), progress=False)
    assert state.ema_params is not None

    # resume restores the EMA tree (template includes it)
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps=7, resume=True))
    state2, _ = loop.train(cfg2, workdir=str(tmp_path), progress=False)
    assert int(state2.step) == 7

    # eval scores live vs EMA weights; both finite, and they differ
    em_live = loop.evaluate(cfg, max_batches=2)
    em_ema = loop.evaluate(cfg, max_batches=2, use_ema=True)
    assert np.isfinite(em_live["rmse"]) and np.isfinite(em_ema["rmse"])
    assert em_live["rmse"] != em_ema["rmse"]


def test_eval_ema_on_emaless_checkpoint_raises(tmp_path):
    from ann3depth_tpu.train import loop

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, batch_size=2, steps=3, ckpt_dir=str(tmp_path / "c"),
            checkpoint_every=3, eval_every=0))
    loop.train(cfg, workdir=str(tmp_path), progress=False)
    with pytest.raises(ValueError, match="no ema_params"):
        loop.evaluate(cfg, max_batches=1, use_ema=True)


@pytest.mark.slow
def test_resume_survives_ema_flag_toggle(tmp_path):
    """--ema-decay toggled between runs must not break resume in either
    direction (StandardRestore demands exact structure; the template must
    mirror the CHECKPOINT, not the new run's config)."""
    from ann3depth_tpu.train import loop

    def cfg_with(steps, decay, resume):
        cfg = get_config("smoke")
        return dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, batch_size=2, steps=steps, ema_decay=decay,
                resume=resume, ckpt_dir=str(tmp_path / "c"),
                checkpoint_every=100, eval_every=0))

    # train WITHOUT ema, resume WITH: EMA re-seeds from restored params
    loop.train(cfg_with(3, 0.0, False), workdir=str(tmp_path),
               progress=False)
    state, _ = loop.train(cfg_with(5, 0.9, True), workdir=str(tmp_path),
                          progress=False)
    assert int(state.step) == 5 and state.ema_params is not None

    # resume WITHOUT ema a checkpoint that HAS it: extra tree is dropped
    state, _ = loop.train(cfg_with(7, 0.0, True), workdir=str(tmp_path),
                          progress=False)
    assert int(state.step) == 7 and state.ema_params is None


def test_cli_parses_ema_flags():
    from ann3depth_tpu.cli import build_parser, _resolve

    args = build_parser().parse_args(
        ["train", "--config", "smoke", "--ema-decay", "0.999"])
    assert _resolve(args).train.ema_decay == 0.999
    args = build_parser().parse_args(["eval", "--config", "smoke", "--ema"])
    assert args.ema is True
