"""--zero1 end-to-end: the train loop drives the sharded-optimizer step
(parallel/zero1.py), checkpoints round-trip through the same manager, and
serving-side consumers restore params from a ZeRO-1 checkpoint."""

import dataclasses

import numpy as np
import pytest

from ann3depth_tpu.config import get_config


def _smoke_zero1(tmp_path, steps, resume=False):
    cfg = get_config("smoke")
    return dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, batch_size=8, steps=steps, zero1=True, resume=resume,
            ckpt_dir=str(tmp_path / "ckpt"), checkpoint_every=5,
            log_every=2, eval_every=0),
    )


@pytest.mark.slow
def test_zero1_loop_train_resume_and_eval(tmp_path, cpu_mesh):
    from ann3depth_tpu.train import loop

    cfg = _smoke_zero1(tmp_path, steps=5)
    state, metrics = loop.train(cfg, workdir=str(tmp_path), progress=False)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 5
    # moments are actually sharded: flat 1/N chunks (plus scalar counts),
    # never param-shaped tensors
    import jax
    leaves = jax.tree.leaves(state.opt_state)
    assert all(l.ndim <= 1 for l in leaves)
    assert any(l.ndim == 1 for l in leaves)

    # resume continues the step counter through the zero1 template restore
    cfg = _smoke_zero1(tmp_path, steps=8, resume=True)
    state, metrics = loop.train(cfg, workdir=str(tmp_path), progress=False)
    assert int(state.step) == 8
    assert np.isfinite(float(metrics["loss"]))

    # eval restores params-only from the zero1 checkpoint (the serving-side
    # path shared by eval/infer/export/serve/live)
    em = loop.evaluate(cfg, max_batches=2)
    assert np.isfinite(em["rmse"]) and em["rmse"] > 0


def test_zero1_rejects_grad_accum(tmp_path):
    from ann3depth_tpu.train import loop

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=8, zero1=True,
                                       grad_accum=2))
    with pytest.raises(ValueError, match="zero1 with grad_accum"):
        loop.train(cfg, workdir=str(tmp_path))


def test_cli_parses_zero1():
    from ann3depth_tpu.cli import build_parser, _resolve

    args = build_parser().parse_args(
        ["train", "--config", "smoke", "--zero1"])
    assert _resolve(args).train.zero1 is True
    args = build_parser().parse_args(["train", "--config", "smoke"])
    assert _resolve(args).train.zero1 is False
