"""Flip test-time augmentation (train/step.apply_with_tta + --tta)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu.config import get_config
from ann3depth_tpu.models import registry
from ann3depth_tpu.train import loop as looplib
from ann3depth_tpu.train import step as steplib

INPUT_HW = (48, 64)


def _model_state(cfg):
    model = registry.build(cfg.model)
    params = steplib.init_params(model, INPUT_HW, seed=0)
    tx = steplib.make_optimizer(1e-4)
    return model, steplib.TrainState.create(model.apply, params, tx)


def _cfg():
    cfg = get_config("smoke")
    return dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, input_hw=INPUT_HW))


def test_tta_matches_two_pass_oracle():
    """tta='flip' equals the hand-computed linear-depth average of the
    plain prediction and the un-flipped mirrored-input prediction."""
    cfg = _cfg()
    model, state = _model_state(cfg)
    images = jax.random.normal(jax.random.key(1), (2, *INPUT_HW, 3),
                               jnp.float32)

    combined = steplib.apply_with_tta(model.apply, state.params, images,
                                      "flip")
    p1 = model.apply({"params": state.params}, images)
    p2 = model.apply({"params": state.params}, images[:, :, ::-1, :])
    expected = jnp.log(0.5 * (jnp.exp(p1) + jnp.exp(p2[:, :, ::-1, :])))
    np.testing.assert_allclose(np.asarray(combined), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)
    # and it is a genuinely different prediction than the plain pass
    assert not np.allclose(np.asarray(combined), np.asarray(p1))


def test_infer_step_tta():
    cfg = _cfg()
    model, state = _model_state(cfg)
    img = np.random.default_rng(0).integers(0, 256, (1, 56, 72, 3),
                                            dtype=np.uint8)
    plain = np.asarray(steplib.infer_step(state.apply_fn, state.params, img,
                                          input_hw=INPUT_HW))
    tta = np.asarray(steplib.infer_step(state.apply_fn, state.params, img,
                                        input_hw=INPUT_HW, tta="flip"))
    assert tta.shape == plain.shape and np.all(tta > 0)
    assert not np.allclose(tta, plain)


def test_apply_with_tta_rejects_unknown_mode():
    cfg = _cfg()
    model, state = _model_state(cfg)
    images = jnp.zeros((1, *INPUT_HW, 3), jnp.float32)
    with pytest.raises(ValueError, match="unknown tta"):
        steplib.apply_with_tta(model.apply, state.params, images, "rot90")


@pytest.mark.slow
def test_evaluate_tta_end_to_end():
    """loop.evaluate(tta='flip') runs (both stats and report paths give
    the same dataset metrics, as without tta)."""
    cfg = _cfg()
    _, state = _model_state(cfg)
    m_plain = looplib.evaluate(cfg, state=state, max_batches=2)
    m_tta = looplib.evaluate(cfg, state=state, max_batches=2, tta="flip")
    assert set(m_tta) == set(m_plain)
    assert m_tta["rmse"] != m_plain["rmse"]
