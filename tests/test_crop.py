"""Literature eval crops (`eval --crop eigen|garg`, losses.eval_crop_mask):
metrics restricted to the Eigen/Garg fractional window of the depth map —
the crop-conditioned protocol published KITTI/NYU monocular-depth numbers
use (VERDICT r3 missing #4). Constants live in
compat/reference_spec.EVAL_CROPS as a flagged choice."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu.compat import reference_spec as ref
from ann3depth_tpu.train import losses
from ann3depth_tpu.train import step as steplib


def test_crop_mask_matches_fraction_oracle():
    h, w = 120, 160
    for name, (t, b, l, r) in ref.EVAL_CROPS.items():
        m = losses.eval_crop_mask((h, w), name)
        oracle = np.zeros((h, w), bool)
        oracle[int(t * h):int(b * h), int(l * w):int(r * w)] = True
        np.testing.assert_array_equal(m, oracle)
        assert 0 < m.sum() < h * w  # a real crop: neither empty nor full
    assert losses.eval_crop_mask((h, w), "") is None
    with pytest.raises(ValueError, match="unknown eval crop"):
        losses.eval_crop_mask((h, w), "center")


def test_cropped_metrics_equal_metrics_of_cropped_subarray():
    """Masked global stats == stats computed on the sliced crop window —
    the numpy-oracle identity that makes --crop a protocol, not a guess."""
    rng = np.random.default_rng(0)
    h, w = 30, 40
    target = rng.uniform(1.0, 30.0, (3, h, w)).astype(np.float32)
    pred_log = (np.log(target)
                + rng.normal(0, 0.3, target.shape)).astype(np.float32)

    for name, (t, b, l, r) in ref.EVAL_CROPS.items():
        mask = losses.eval_crop_mask((h, w), name)
        got = losses.finalize_depth_metrics(jax.device_get(
            losses.depth_metric_stats(pred_log[..., None], target, mask)))
        rs, re = int(t * h), int(b * h)
        cs, ce = int(l * w), int(r * w)
        want = losses.finalize_depth_metrics(jax.device_get(
            losses.depth_metric_stats(
                pred_log[:, rs:re, cs:ce, None], target[:, rs:re, cs:ce])))
        for k in want:
            assert float(got[k]) == pytest.approx(float(want[k]),
                                                  rel=1e-5), (name, k)


def test_crop_composes_with_median_align():
    """--align median under --crop computes the medians INSIDE the crop:
    a prediction that is exactly 2x GT inside the crop (garbage outside)
    aligns to RMSE ~0 on the cropped metrics."""
    rng = np.random.default_rng(1)
    h, w = 30, 40
    target = rng.uniform(1.0, 30.0, (2, h, w)).astype(np.float32)
    pred_log = (np.log(target) + np.log(2.0)).astype(np.float32)
    mask = losses.eval_crop_mask((h, w), "eigen")
    # poison the outside-crop prediction; it must not affect the median
    pred_log[:, ~mask] = 5.0

    aligned = steplib.apply_alignment(jnp.asarray(pred_log[..., None]),
                                      target, "median", mask)
    m = losses.finalize_depth_metrics(jax.device_get(
        losses.depth_metric_stats(aligned, target, mask)))
    assert float(m["rmse"]) == pytest.approx(0.0, abs=1e-3)
    assert float(m["delta1"]) == pytest.approx(1.0)


def test_evaluate_with_crop_end_to_end(tmp_path):
    """loop.evaluate(crop=...) runs the jitted stats path; cropped metrics
    differ from full-frame ones, and the report path carries the crop."""
    import os

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
    cropped = looplib.evaluate(cfg, state=state, max_batches=2,
                               crop="garg")
    assert np.isfinite(cropped["rmse"])
    assert cropped["rmse"] != pytest.approx(plain["rmse"], rel=1e-4)

    rd = str(tmp_path / "report")
    reported = looplib.evaluate(cfg, state=state, max_batches=2,
                                crop="garg", report_dir=rd)
    # report-path accumulation equals the stats-path accumulation
    assert reported["rmse"] == pytest.approx(cropped["rmse"], rel=1e-5)
    assert os.path.exists(os.path.join(rd, "per_image.jsonl"))


def test_cli_crop_flag_resolves():
    from ann3depth_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["eval", "--config", "smoke", "--crop", "eigen"])
    assert args.crop == "eigen"
    assert build_parser().parse_args(
        ["eval", "--config", "smoke"]).crop == ""
