"""Per-image eval attribution (losses.per_image_metric_stats +
loop.evaluate(report_dir=...) + CLI `eval --report-dir`)."""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from ann3depth_tpu.train import losses


def test_per_image_stats_sum_to_global():
    rng = np.random.default_rng(0)
    target = rng.uniform(0.5, 60.0, (4, 8, 10)).astype(np.float32)
    target[0, :2] = 0.0  # invalid pixels
    pred_log = rng.normal(1.0, 0.5, (4, 8, 10, 1)).astype(np.float32)

    per = losses.per_image_metric_stats(pred_log, target)
    glob = losses.depth_metric_stats(pred_log, target, si_lambda=0.5)
    for k, v in per.items():
        assert v.shape == (4,), k
        np.testing.assert_allclose(float(np.sum(np.asarray(v))),
                                   float(glob[k]), rtol=1e-5)


def test_per_image_finalize_matches_single_image_oracle():
    """finalize_depth_metrics maps elementwise over [B] stats; each entry
    must equal the metrics of that image evaluated alone."""
    rng = np.random.default_rng(1)
    target = rng.uniform(0.5, 60.0, (3, 6, 7)).astype(np.float32)
    pred_log = rng.normal(1.0, 0.5, (3, 6, 7)).astype(np.float32)

    per = {k: np.asarray(v) for k, v in
           losses.per_image_metric_stats(pred_log, target).items()}
    fin = losses.finalize_depth_metrics(per)
    for i in range(3):
        solo = losses.depth_metrics(pred_log[i:i + 1], target[i:i + 1])
        for k in ("rmse", "abs_rel", "delta1", "rmse_log", "log10"):
            np.testing.assert_allclose(float(fin[k][i]), float(solo[k]),
                                       rtol=1e-5, err_msg=f"{k}[{i}]")


def _smoke_cfg(tmp_path, batch=4):
    from ann3depth_tpu.config import get_config

    cfg = get_config("smoke")
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, input_hw=(48, 64)),
        train=dataclasses.replace(cfg.train, batch_size=batch,
                                  ckpt_dir=str(tmp_path / "ckpt")),
    )


def test_evaluate_report_dir_writes_attribution(tmp_path):
    from ann3depth_tpu.train import loop as looplib

    cfg = _smoke_cfg(tmp_path)
    state = looplib.create_state(cfg)
    rdir = str(tmp_path / "report")
    metrics = looplib.evaluate(cfg, state=state, max_batches=3,
                               report_dir=rdir, report_worst=4)
    # identical dataset metrics as the no-report path (same sums, modulo
    # f32 vs host-f64 accumulation order)
    plain = looplib.evaluate(cfg, state=state, max_batches=3)
    for k in metrics:
        assert metrics[k] == pytest.approx(plain[k], rel=1e-4), k

    rows = [json.loads(l) for l in
            open(os.path.join(rdir, "per_image.jsonl"))]
    assert len(rows) == 3 * cfg.train.batch_size
    assert rows[0]["index"] == 0 and rows[-1]["index"] == len(rows) - 1
    assert all(np.isfinite(r["rmse"]) and r["rmse"] > 0 for r in rows)

    summary = json.load(open(os.path.join(rdir, "summary.json")))
    assert summary["images"] == len(rows)
    assert summary["metrics"]["rmse"] == pytest.approx(metrics["rmse"])
    # KITTI-comparable SILog (r5): both forms present, and silog_kitti is
    # the mean of the per-image rows' silog x100 (each row finalizes one
    # image, so its silog_kitti == 100 * its silog).
    assert summary["metrics"]["silog_kitti"] == pytest.approx(
        100.0 * np.mean([r["silog"] for r in rows]), rel=1e-4)
    assert all(r["silog_kitti"] == pytest.approx(100.0 * r["silog"],
                                                 rel=1e-5) for r in rows)
    # worst list is the top-K per-image RMSEs, ranked worst-first
    worst = summary["worst"]
    assert len(worst) == 4
    top = sorted((r["rmse"] for r in rows), reverse=True)[:4]
    np.testing.assert_allclose([w["rmse"] for w in worst], top, rtol=1e-6)

    # triple grid: K rows of (rgb | gt | pred) at input resolution
    from PIL import Image
    grid = np.asarray(Image.open(os.path.join(rdir, "worst.png")))
    assert grid.shape == (4 * 48, 3 * 64, 3)


def test_evaluate_report_worst_zero_skips_grid(tmp_path):
    """report_worst=0: per_image.jsonl only — must not crash on the
    empty worst heap or write a grid."""
    from ann3depth_tpu.train import loop as looplib

    cfg = _smoke_cfg(tmp_path)
    rdir = str(tmp_path / "report0")
    m = looplib.evaluate(cfg, state=looplib.create_state(cfg),
                         max_batches=1, report_dir=rdir, report_worst=0)
    assert np.isfinite(m["rmse"])
    assert os.path.exists(os.path.join(rdir, "per_image.jsonl"))
    assert not os.path.exists(os.path.join(rdir, "worst.png"))
    assert json.load(open(os.path.join(rdir, "summary.json")))["worst"] == []


def test_evaluate_report_rejects_multiprocess(tmp_path, monkeypatch):
    from ann3depth_tpu.train import loop as looplib

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="single-process"):
        looplib.evaluate(_smoke_cfg(tmp_path), report_dir=str(tmp_path))


def test_cli_eval_multi_dataset_per_dataset_metrics(tmp_path, capsys):
    """--datasets a b: eval scores each test split separately (a blended
    RMSE would hide per-domain regressions); reports go to per-dataset
    subdirs."""
    import scipy.io
    from PIL import Image

    from ann3depth_tpu.cli import main

    # miniature Make3D test split next to the synthetic dataset
    rng = np.random.default_rng(0)
    base = tmp_path / "make3d"
    for sub in ("Test134", "Gridlaserdata", "Train400Img", "Train400Depth"):
        (base / sub).mkdir(parents=True)
    for i in range(2):
        sid = f"test-{i:03d}"
        Image.fromarray(rng.integers(0, 256, (96, 72, 3), dtype=np.uint8)
                        ).save(base / "Test134" / f"img-{sid}.jpg")
        grid = np.zeros((55, 305, 4), np.float32)
        grid[..., 3] = rng.uniform(1, 70, (55, 305))
        scipy.io.savemat(
            base / "Gridlaserdata" / f"depth_sph_corr-{sid}.mat",
            {"Position3DGrid": grid})

    rc = main(["train", "--config", "smoke", "--steps", "2",
               "--batch-size", "2", "--ckpt-dir", str(tmp_path / "c"),
               "--workdir", str(tmp_path / "w")])
    assert rc == 0
    rdir = str(tmp_path / "rep")
    rc = main(["eval", "--config", "smoke",
               "--datasets", "synthetic", "make3d",
               "--data-dir", str(tmp_path), "--batch-size", "2",
               "--ckpt-dir", str(tmp_path / "c"), "--max-batches", "1",
               "--report-dir", rdir])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {"synthetic", "make3d"}
    for name, m in out.items():
        assert np.isfinite(m["rmse"]) and m["rmse"] > 0, name
        assert os.path.exists(os.path.join(rdir, name, "per_image.jsonl"))


def test_cli_eval_report(tmp_path, capsys):
    from ann3depth_tpu.cli import main

    rc = main(["train", "--config", "smoke", "--steps", "2",
               "--batch-size", "2", "--ckpt-dir", str(tmp_path / "c"),
               "--workdir", str(tmp_path / "w")])
    assert rc == 0
    rdir = str(tmp_path / "rep")
    rc = main(["eval", "--config", "smoke", "--batch-size", "2",
               "--ckpt-dir", str(tmp_path / "c"), "--max-batches", "2",
               "--report-dir", rdir, "--report-worst", "3"])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(metrics["rmse"])
    assert os.path.exists(os.path.join(rdir, "worst.png"))
    rows = open(os.path.join(rdir, "per_image.jsonl")).read().splitlines()
    assert len(rows) == 4
