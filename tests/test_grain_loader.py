"""grain-backed input pipeline tests (SURVEY M2)."""

import numpy as np
import pytest

pytest.importorskip("grain")

from ann3depth_tpu.data.synthetic import SyntheticDepthDataset  # noqa: E402
from ann3depth_tpu.pipeline.grain_loader import grain_batches  # noqa: E402


def test_grain_batches_shapes_and_count():
    ds = SyntheticDepthDataset(n=12, img_hw=(24, 32), depth_hw=(12, 16))
    batches = list(grain_batches(ds, 4, steps=3, seed=0))
    assert len(batches) == 3
    img, dep = batches[0]
    assert img.shape == (4, 24, 32, 3) and img.dtype == np.uint8
    assert dep.shape == (4, 12, 16) and dep.dtype == np.float32


def test_grain_shuffle_is_seeded():
    ds = SyntheticDepthDataset(n=16, img_hw=(8, 8), depth_hw=(4, 4))
    a = [b[0] for b in grain_batches(ds, 4, steps=2, seed=7)]
    b = [b[0] for b in grain_batches(ds, 4, steps=2, seed=7)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = [b[0] for b in grain_batches(ds, 4, steps=2, seed=8)]
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_grain_single_epoch_exhausts():
    ds = SyntheticDepthDataset(n=10, img_hw=(8, 8), depth_hw=(4, 4))
    batches = list(grain_batches(ds, 4, steps=None, shuffle=False))
    assert len(batches) == 2  # 10 // 4, remainder dropped


@pytest.mark.slow
def test_train_loop_runs_on_grain_pipeline(tmp_path):
    """End-to-end: the training loop consumes the grain host pipeline when
    DataConfig.use_grain is set (VERDICT r1 missing #4)."""
    import dataclasses
    import json

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, use_grain=True,
                                 input_hw=(48, 64)),
        train=dataclasses.replace(cfg.train, steps=4, batch_size=2,
                                  ckpt_dir=str(tmp_path / "ckpt"),
                                  log_every=2, checkpoint_every=100))
    state, metrics = looplib.train(cfg, workdir=str(tmp_path), progress=False)
    assert int(state.step) == 4
    assert np.isfinite(metrics["loss"])
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines  # metrics flowed through the grain-fed loop


def test_train_loop_grain_multi_dataset_interleave(tmp_path):
    """r3: --use-grain with several datasets round-robins one grain
    pipeline per source (was a NotImplementedError)."""
    import dataclasses

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, use_grain=True,
                                 datasets=("synthetic", "synthetic")),
        train=dataclasses.replace(cfg.train, batch_size=4, steps=6,
                                  ckpt_dir=str(tmp_path / "ckpt"),
                                  log_every=3, eval_every=0,
                                  checkpoint_every=6),
    )
    state, metrics = looplib.train(cfg, workdir=str(tmp_path),
                                   progress=False)
    assert int(state.step) == 6
    assert np.isfinite(float(metrics["loss"]))


def test_round_robin_bounds_and_drops_exhausted():
    from ann3depth_tpu.data.batching import round_robin

    a, b = iter([1, 2]), iter([10, 20, 30, 40])
    assert list(round_robin([a, b])) == [1, 10, 2, 20, 30, 40]
    assert list(round_robin([iter([1, 2]), iter([10, 20])], steps=3)) == [
        1, 10, 2]
