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


@pytest.mark.slow
def test_zero1_composes_grad_accum_and_ema(tmp_path, cpu_mesh):
    """--zero1 --grad-accum --ema-decay all together: the loop drives the
    scanned-microbatch sharded-optimizer step, the EMA tree rides the
    checkpoint, and eval --ema restores it (r3: the two 'pick one' guards
    replaced by a real composition; see tests/test_zero1.py for step-level
    equality)."""
    import jax
    import numpy as np

    from ann3depth_tpu.train import loop

    cfg = _smoke_zero1(tmp_path, steps=4)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum=2,
                                       ema_decay=0.9, checkpoint_every=4))
    state, metrics = loop.train(cfg, workdir=str(tmp_path), progress=False)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 4
    assert state.ema_params is not None
    # EMA actually moved away from params (decay < 1, steps > 0)
    p0 = jax.tree.leaves(state.params)[0]
    e0 = jax.tree.leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(e0))
    # opt state is still the sharded flat-chunk layout
    leaves = jax.tree.leaves(state.opt_state)
    assert all(l.ndim <= 1 for l in leaves)
    assert any(l.ndim == 1 for l in leaves)

    # resume restores the EMA tree and continues
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps=6, resume=True))
    state2, metrics = loop.train(cfg, workdir=str(tmp_path), progress=False)
    assert int(state2.step) == 6
    assert np.isfinite(float(metrics["loss"]))

    # eval --ema scores the Polyak-averaged weights from a zero1 checkpoint
    em = loop.evaluate(cfg, max_batches=2, use_ema=True)
    assert np.isfinite(em["rmse"]) and em["rmse"] > 0


def test_cli_parses_zero1():
    from ann3depth_tpu.cli import build_parser, _resolve

    args = build_parser().parse_args(
        ["train", "--config", "smoke", "--zero1"])
    assert _resolve(args).train.zero1 is True
    args = build_parser().parse_args(["train", "--config", "smoke"])
    assert _resolve(args).train.zero1 is False
