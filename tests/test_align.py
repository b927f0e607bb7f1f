"""Median scale alignment for eval (`eval --align median`,
train/step.apply_alignment): the standard scale-ambiguous monocular-depth
protocol — each prediction is rescaled by median(gt)/median(pred) over
valid pixels before metrics (Zhou et al. 2017 lineage)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu.train import losses
from ann3depth_tpu.train import step as steplib


def test_median_align_cancels_global_scale_error():
    """A prediction that is exactly 2x the GT depth scores RMSE ~0 after
    median alignment (and badly without)."""
    rng = np.random.default_rng(0)
    target = rng.uniform(1.0, 30.0, (2, 6, 8)).astype(np.float32)
    pred_log = (np.log(target) + np.log(2.0)).astype(np.float32)[..., None]

    raw = losses.depth_metrics(pred_log, target)
    assert float(raw["rmse"]) > 1.0

    aligned = steplib.apply_alignment(jnp.asarray(pred_log), target,
                                      align="median")
    m = losses.depth_metrics(aligned, target)
    assert float(m["rmse"]) == pytest.approx(0.0, abs=1e-4)
    assert float(m["delta1"]) == pytest.approx(1.0)


def test_median_align_matches_numpy_ratio_of_medians():
    rng = np.random.default_rng(1)
    target = rng.uniform(1.0, 30.0, (3, 5, 7)).astype(np.float32)
    pred_log = (np.log(target)
                + rng.normal(0, 0.4, target.shape)).astype(np.float32)

    aligned = np.asarray(steplib.apply_alignment(
        jnp.asarray(pred_log[..., None]), target, align="median"))[..., 0]
    for b in range(3):
        s = np.median(target[b]) / np.median(np.exp(pred_log[b]))
        np.testing.assert_allclose(aligned[b], pred_log[b] + np.log(s),
                                   rtol=1e-5, atol=1e-5)


def test_median_align_ignores_invalid_pixels():
    """Far-plane (capped) pixels must not drag the medians."""
    rng = np.random.default_rng(2)
    target = rng.uniform(1.0, 30.0, (1, 4, 4)).astype(np.float32)
    pred_log = (np.log(target) + 0.3).astype(np.float32)
    t2 = target.copy()
    t2[0, 0, :] = 500.0  # invalid row (above MAKE3D_DEPTH_CAP)
    p2 = pred_log.copy()
    p2[0, 0, :] = 9.0  # garbage prediction there

    a = np.asarray(steplib.apply_alignment(
        jnp.asarray(p2[..., None]), t2, align="median"))[..., 0]
    valid = t2[0] <= 70.0
    s = np.median(t2[0][valid]) / np.median(np.exp(p2[0][valid]))
    np.testing.assert_allclose(a[0][valid], p2[0][valid] + np.log(s),
                               rtol=1e-5, atol=1e-5)


def test_align_noop_and_unknown_mode():
    x = jnp.zeros((1, 2, 2, 1))
    d = np.full((1, 2, 2), 5.0, np.float32)
    assert steplib.apply_alignment(x, d, align="") is x
    with pytest.raises(ValueError, match="unknown align mode"):
        steplib.apply_alignment(x, d, align="affine")


def test_evaluate_with_align_end_to_end(tmp_path):
    """loop.evaluate(align='median') runs the jitted stats path and
    actually changes the shift-sensitive metrics. SILog moves only
    through the cross-image pooling of per-image shifts (it is invariant
    per image), so it stays close; RMSE/rmse_log move freely. (Aligned
    RMSE is NOT asserted lower: median scaling is not the RMSE-minimizing
    scale.)"""
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    base = get_config("smoke")
    cfg = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, input_hw=(48, 64)),
        train=dataclasses.replace(base.train, steps=2, batch_size=2,
                                  ckpt_dir=str(tmp_path / "c"),
                                  checkpoint_every=2, log_every=2))
    state, _ = looplib.train(cfg, workdir=str(tmp_path), progress=False)
    plain = looplib.evaluate(cfg, state=state, max_batches=2)
    aligned = looplib.evaluate(cfg, state=state, max_batches=2,
                               align="median")
    assert np.isfinite(aligned["rmse"])
    assert aligned["silog"] == pytest.approx(plain["silog"], rel=0.05)
    assert aligned["rmse_log"] != pytest.approx(plain["rmse_log"], rel=1e-3)


def test_cli_align_flag_resolves():
    from ann3depth_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["eval", "--config", "smoke", "--align", "median"])
    assert args.align == "median"
    assert build_parser().parse_args(
        ["eval", "--config", "smoke"]).align == ""
