"""Knowledge distillation (train/step.distill_train_step, --distill-from).

A frozen teacher's log-depth map becomes a second regression target for
the student inside one jitted step; the loop restores the teacher from a
checkpoint dir (loop.train's dstep path). The reference has no
equivalent — this completes the rebuild's compression ladder alongside
--quant int8 / int8-qat.
"""

import dataclasses
import json

import jax
import numpy as np
import pytest

from ann3depth_tpu.config import get_config
from ann3depth_tpu.models import registry
from ann3depth_tpu.train import loop as looplib
from ann3depth_tpu.train import step as steplib

INPUT_HW = (48, 64)


def _model_state(name="small", width=1.0, seed=0, lr=1e-3):
    cfg = get_config("smoke")
    mcfg = dataclasses.replace(cfg.model, name=name, width_mult=width)
    model = registry.build(mcfg)
    params = steplib.init_params(model, INPUT_HW, seed=seed)
    tx = steplib.make_optimizer(lr, warmup_steps=0, total_steps=None)
    return model, steplib.TrainState.create(model.apply, params, tx)


def _batch(batch=2, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (batch, 56, 72, 3), dtype=np.uint8)
    dep = rng.uniform(1.0, 50.0, (batch, 28, 36)).astype(np.float32)
    return img, dep


def test_alpha_zero_matches_plain_step():
    """distill_alpha=0 degenerates to the plain train step exactly (the
    teacher term is scaled by a literal 0); guards the gt-loss half of
    the blended objective against drift."""
    target_hw = registry.output_hw("small", INPUT_HW)
    img, dep = _batch()
    teacher, tstate = _model_state(seed=7)
    rng = jax.random.key(0)

    _, s_plain = _model_state(seed=0)
    s_plain, m_plain = steplib.train_step(
        s_plain, img, dep, rng, input_hw=INPUT_HW, target_hw=target_hw)

    _, s_dist = _model_state(seed=0)
    s_dist, m_dist = steplib.distill_train_step(
        s_dist, tstate.params, img, dep, rng, teacher_apply=teacher.apply,
        input_hw=INPUT_HW, target_hw=target_hw, distill_alpha=0.0)

    np.testing.assert_allclose(float(m_plain["loss"]),
                               float(m_dist["loss"]), rtol=1e-6)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(s_plain.params)[0],
            jax.tree_util.tree_flatten_with_path(s_dist.params)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7, err_msg=str(pa))


def test_alpha_one_pulls_student_toward_teacher():
    """Pure distillation (alpha=1) drives the teacher-matching MSE down —
    the student copies the (differently-initialized) teacher."""
    target_hw = registry.output_hw("small", INPUT_HW)
    img, dep = _batch(batch=4)
    teacher, tstate = _model_state(seed=7)
    _, state = _model_state(seed=0, lr=3e-3)
    rng = jax.random.key(1)

    first = last = None
    for _ in range(40):
        state, metrics = steplib.distill_train_step(
            state, tstate.params, img, dep, rng, teacher_apply=teacher.apply,
            input_hw=INPUT_HW, target_hw=target_hw, distill_alpha=1.0)
        last = float(metrics["distill"])
        first = last if first is None else first
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)


def test_teacher_student_output_grid_mismatch_resizes():
    """encdec teacher (stride-/2 head) distilling into the 3-conv `small`
    net (stride /8): the teacher map takes the bilinear-resize branch."""
    target_hw = registry.output_hw("small", INPUT_HW)
    teacher_hw = registry.output_hw("encdec", INPUT_HW)
    assert teacher_hw != target_hw  # the premise of this test
    img, dep = _batch()
    teacher, tstate = _model_state(name="encdec")
    _, state = _model_state(seed=0)

    state, metrics = steplib.distill_train_step(
        state, tstate.params, img, dep, jax.random.key(0),
        teacher_apply=teacher.apply, input_hw=INPUT_HW, target_hw=target_hw,
        distill_alpha=0.5)
    for k in ("loss", "gt_loss", "distill", "rmse"):
        assert np.isfinite(float(metrics[k])), (k, metrics)


@pytest.mark.slow
def test_distill_loop_end_to_end(tmp_path):
    """Teacher trains and checkpoints; a fresh student trains with
    distill_from pointing at it; the distill metric is logged."""
    base = get_config("smoke")
    teacher_dir = str(tmp_path / "teacher")
    tcfg = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, input_hw=INPUT_HW),
        train=dataclasses.replace(base.train, steps=4, batch_size=2,
                                  checkpoint_every=4, log_every=2,
                                  warmup_steps=0, ckpt_dir=teacher_dir))
    looplib.train(tcfg, workdir=str(tmp_path / "tw"), progress=False)

    scfg = dataclasses.replace(
        tcfg,
        train=dataclasses.replace(tcfg.train,
                                  ckpt_dir=str(tmp_path / "student"),
                                  distill_from=teacher_dir,
                                  distill_alpha=0.5))
    state, metrics = looplib.train(scfg, workdir=str(tmp_path / "sw"),
                                   progress=False)
    assert int(state.step) == 4
    lines = [json.loads(l) for l in open(tmp_path / "sw" / "metrics.jsonl")]
    assert "distill" in lines[-1] and np.isfinite(lines[-1]["distill"])
    assert "gt_loss" in lines[-1]


def test_distill_rejections(tmp_path):
    base = get_config("smoke")

    def cfg(**train_kw):
        kw = dict(steps=2, batch_size=2, ckpt_dir=str(tmp_path / "c"),
                  distill_from=str(tmp_path / "t"))
        kw.update(train_kw)
        return dataclasses.replace(
            base,
            data=dataclasses.replace(base.data, input_hw=INPUT_HW),
            train=dataclasses.replace(base.train, **kw))

    with pytest.raises(ValueError, match="distill_from composes"):
        looplib.train(cfg(zero1=True), progress=False)
    with pytest.raises(ValueError, match="distill_from composes"):
        looplib.train(cfg(grad_accum=2, batch_size=4), progress=False)
    with pytest.raises(ValueError, match="distill_alpha"):
        looplib.train(cfg(distill_alpha=0.0), progress=False)
    # empty teacher dir -> loud, names the dir and the expected arch
    with pytest.raises(RuntimeError, match="no teacher checkpoint"):
        looplib.train(cfg(), progress=False)


def test_cli_distill_flags_resolve():
    from ann3depth_tpu import cli

    args = cli.build_parser().parse_args(
        ["train", "--config", "smoke", "--distill-from", "/t/ckpt",
         "--distill-model", "encdec", "--distill-width-mult", "2.0",
         "--distill-alpha", "0.3"])
    cfg = cli._resolve(args)
    assert cfg.train.distill_from == "/t/ckpt"
    assert cfg.train.distill_model == "encdec"
    assert cfg.train.distill_width_mult == 2.0
    assert cfg.train.distill_alpha == 0.3
