"""Hyperparameter sweep runner (ann3depth_tpu/sweep.py): param parsing,
override typing, and the end-to-end grid train+eval+ledger path."""

import dataclasses
import json
import os

import pytest

from ann3depth_tpu import sweep as sweeplib
from ann3depth_tpu.config import get_config


def test_parse_param_types():
    path, vals = sweeplib.parse_param("train.learning_rate=1e-4,3e-4")
    assert path == "train.learning_rate" and vals == [1e-4, 3e-4]
    assert all(isinstance(v, float) for v in vals)

    _, vals = sweeplib.parse_param("train.steps=10,20")
    assert vals == [10, 20] and all(isinstance(v, int) for v in vals)

    _, vals = sweeplib.parse_param("data.augment=true,false")
    assert vals == [True, False]

    _, vals = sweeplib.parse_param("model.name=small,encdec")
    assert vals == ["small", "encdec"]

    # Optional[int] fields coerce through the inner type
    _, vals = sweeplib.parse_param("train.resume_step=5")
    assert vals == [5] and isinstance(vals[0], int)


def test_parse_param_errors():
    with pytest.raises(KeyError, match="no config field"):
        sweeplib.parse_param("train.nope=1")
    with pytest.raises(KeyError, match="no config field"):
        sweeplib.parse_param("nosection.lr=1")
    with pytest.raises(ValueError, match="dotted.path"):
        sweeplib.parse_param("train.learning_rate")
    with pytest.raises(ValueError, match="no values"):
        sweeplib.parse_param("train.learning_rate=")
    with pytest.raises(KeyError, match="not a config section"):
        sweeplib.parse_param("train.learning_rate.x=1")


def test_apply_overrides_nested():
    cfg = get_config("smoke")
    out = sweeplib.apply_overrides(
        cfg, {"train.learning_rate": 3e-4, "model.width_mult": 2.0,
              "data.augment": True})
    assert out.train.learning_rate == 3e-4
    assert out.model.width_mult == 2.0
    assert out.data.augment is True
    # untouched fields survive
    assert out.train.batch_size == cfg.train.batch_size


@pytest.mark.slow
def test_sweep_end_to_end(tmp_path):
    """2-point lr grid on the smoke config: both trials train + eval,
    the ledger has one row each, and summary picks the lower-rmse one."""
    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, input_hw=(48, 64)),
        train=dataclasses.replace(cfg.train, steps=6, batch_size=2,
                                  checkpoint_every=6, log_every=3))
    out_dir = str(tmp_path / "sweep")
    grid = [sweeplib.parse_param("train.learning_rate=1e-3,1e-4")]
    result = sweeplib.run_sweep(cfg, grid, out_dir, metric="rmse",
                                max_eval_batches=2, progress=False)

    assert len(result["rows"]) == 2
    with open(os.path.join(out_dir, "sweep.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    assert [r["trial"] for r in rows] == [0, 1]
    assert rows[0]["overrides"] == {"train.learning_rate": 1e-3}
    for r in rows:
        assert "rmse" in r["eval"] and r["eval"]["rmse"] > 0
        assert os.path.isdir(os.path.join(out_dir,
                                          f"trial_{r['trial']:03d}", "ckpt"))

    best = result["best"]
    assert best["eval"]["rmse"] == min(r["eval"]["rmse"] for r in rows)
    with open(os.path.join(out_dir, "summary.json")) as f:
        summary = json.load(f)
    assert summary["best"]["trial"] == best["trial"]
    assert summary["maximize"] is False

    # delta1 ranks maximizing
    result2 = sweeplib.run_sweep(cfg, grid, str(tmp_path / "sweep2"),
                                 metric="delta1", max_eval_batches=2,
                                 progress=False)
    assert result2["best"]["eval"]["delta1"] == max(
        r["eval"]["delta1"] for r in result2["rows"])


def test_sweep_unknown_metric(tmp_path):
    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, input_hw=(48, 64)),
        train=dataclasses.replace(cfg.train, steps=2, batch_size=2,
                                  checkpoint_every=2))
    grid = [sweeplib.parse_param("train.learning_rate=1e-3")]
    with pytest.raises(KeyError, match="--metric"):
        sweeplib.run_sweep(cfg, grid, str(tmp_path / "s"), metric="nope",
                           max_eval_batches=1, progress=False)


@pytest.mark.slow
def test_sweep_resume_skips_recorded_trials(tmp_path, monkeypatch):
    """Re-running a finished sweep touches no training: every trial is
    served from the ledger. A changed grid re-runs only the new point."""
    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, input_hw=(48, 64)),
        train=dataclasses.replace(cfg.train, steps=2, batch_size=2,
                                  checkpoint_every=2, log_every=2))
    out_dir = str(tmp_path / "sweep")
    grid = [sweeplib.parse_param("train.learning_rate=1e-3,1e-4")]
    first = sweeplib.run_sweep(cfg, grid, out_dir, metric="rmse",
                               max_eval_batches=1, progress=False)

    from ann3depth_tpu.train import loop as looplib

    def boom(*a, **k):
        raise AssertionError("train re-ran for a recorded trial")

    monkeypatch.setattr(looplib, "train", boom)
    second = sweeplib.run_sweep(cfg, grid, out_dir, metric="rmse",
                                max_eval_batches=1, progress=False)
    assert [r["trial"] for r in second["rows"]] == [0, 1]
    assert second["best"]["trial"] == first["best"]["trial"]

    # widening the grid re-runs only the new combination
    monkeypatch.undo()
    grid3 = [sweeplib.parse_param("train.learning_rate=1e-3,1e-4,3e-4")]
    third = sweeplib.run_sweep(cfg, grid3, out_dir, metric="rmse",
                               max_eval_batches=1, progress=False)
    assert len(third["rows"]) == 3


@pytest.mark.slow
def test_sweep_rerun_with_stale_trial_ckpt(tmp_path):
    """A trial whose ledger row is missing (mid-trial kill) or whose
    overrides changed at the same index must restart from a CLEAN ckpt dir
    — stale orbax steps made CheckpointManager.save raise
    StepAlreadyExistsError before the r4 fix (ADVICE r3, medium)."""
    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, input_hw=(48, 64)),
        train=dataclasses.replace(cfg.train, steps=2, batch_size=2,
                                  checkpoint_every=2, log_every=2))
    out_dir = str(tmp_path / "sweep")
    grid = [sweeplib.parse_param("train.learning_rate=1e-3")]
    sweeplib.run_sweep(cfg, grid, out_dir, metric="rmse",
                       max_eval_batches=1, progress=False)

    # mid-trial kill: the ckpt dir has step 2 saved, the ledger row is gone
    os.remove(os.path.join(out_dir, "sweep.jsonl"))
    res = sweeplib.run_sweep(cfg, grid, out_dir, metric="rmse",
                             max_eval_batches=1, progress=False)
    assert len(res["rows"]) == 1

    # changed grid value mapping to the same trial index
    grid2 = [sweeplib.parse_param("train.learning_rate=3e-4")]
    res2 = sweeplib.run_sweep(cfg, grid2, out_dir, metric="rmse",
                              max_eval_batches=1, progress=False)
    assert res2["rows"][0]["overrides"] == {"train.learning_rate": 3e-4}
