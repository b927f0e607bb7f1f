"""Post-hoc checkpoint averaging (CheckpointManager.restore_avg_params,
eval/export --avg-last)."""

import dataclasses

import jax
import numpy as np
import pytest

from ann3depth_tpu.config import get_config
from ann3depth_tpu.train import loop as looplib
from ann3depth_tpu.train import step as steplib
from ann3depth_tpu.train.checkpoint import CheckpointManager


def _base_state(cfg):
    from ann3depth_tpu.models import registry

    model = registry.build(cfg.model)
    params = steplib.init_params(model, cfg.data.input_hw, seed=0)
    tx = steplib.make_optimizer(1e-4)
    return steplib.TrainState.create(model.apply, params, tx)


def _cfg(tmp_path):
    cfg = get_config("smoke")
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, input_hw=(48, 64)),
        train=dataclasses.replace(cfg.train,
                                  ckpt_dir=str(tmp_path / "ckpt")))


def test_restore_avg_params_is_uniform_mean(tmp_path):
    """Three saves with params scaled 1x/2x/3x: avg of the last 2 is
    exactly 2.5x the base, step pins to the newest averaged save."""
    cfg = _cfg(tmp_path)
    state = _base_state(cfg)
    base = jax.tree.map(np.asarray, state.params)

    ckpt = CheckpointManager(cfg.train.ckpt_dir)
    try:
        for i, scale in enumerate([1.0, 2.0, 3.0], start=1):
            scaled = jax.tree.map(lambda a: a * scale, base)
            ckpt.save(i, state.replace(
                step=np.asarray(i), params=scaled))
        ckpt.wait()

        avg_state, steps = ckpt.restore_avg_params(state, 2)
        assert steps == [2, 3]
        assert int(avg_state.step) == 3
        for a, b in zip(jax.tree.leaves(avg_state.params),
                        jax.tree.leaves(base)):
            np.testing.assert_allclose(np.asarray(a), 2.5 * np.asarray(b),
                                       rtol=1e-6)
            assert np.asarray(a).dtype == np.asarray(b).dtype

        with pytest.raises(ValueError, match="only 3 checkpoints"):
            ckpt.restore_avg_params(state, 4)
        with pytest.raises(ValueError, match="avg_last"):
            ckpt.restore_avg_params(state, 0)
    finally:
        ckpt.close()


@pytest.mark.slow
def test_evaluate_avg_last_end_to_end(tmp_path):
    """Short training with two retained saves -> evaluate(avg_last=2)
    produces finite metrics and differs from the latest-step eval."""
    cfg = _cfg(tmp_path)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps=4, batch_size=2,
                                       checkpoint_every=2, log_every=100,
                                       learning_rate=3e-3))
    looplib.train(cfg, workdir=str(tmp_path), progress=False)

    m_latest = looplib.evaluate(cfg, max_batches=2)
    m_avg = looplib.evaluate(cfg, max_batches=2, avg_last=2)
    assert np.isfinite(m_avg["rmse"])
    assert m_avg["rmse"] != m_latest["rmse"]

    with pytest.raises(ValueError, match="exclusive"):
        looplib.evaluate(cfg, max_batches=1, avg_last=2, ckpt_step=2)
