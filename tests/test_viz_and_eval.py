"""Viz utilities + in-loop eval/TB wiring tests (SURVEY §2.1 "Viz", §5)."""

import dataclasses
import glob
import json
import os

import numpy as np
import pytest

from ann3depth_tpu.utils import viz


def test_colormap_depth_shape_and_range():
    d = np.linspace(1, 60, 64, dtype=np.float32).reshape(8, 8)
    img = viz.colormap_depth(d)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    # near and far ends should get different colors
    assert not np.array_equal(img[0, 0], img[-1, -1])


def test_colormap_shared_scale():
    d = np.full((4, 4), 10.0, np.float32)
    a = viz.colormap_depth(d, lo=1.0, hi=100.0)
    b = viz.colormap_depth(d * 0 + 10.0, lo=1.0, hi=100.0)
    np.testing.assert_array_equal(a, b)


def test_denormalize_roundtrip():
    from ann3depth_tpu.compat import reference_spec as ref

    rgb = np.full((4, 4, 3), 128, np.uint8)
    norm = (rgb / 255.0 - np.asarray(ref.RGB_MEAN)) / np.asarray(ref.RGB_STD)
    back = viz.denormalize_to_u8(norm.astype(np.float32))
    np.testing.assert_allclose(back, rgb, atol=1)


def test_triple_grid_layout():
    b, h, w = 3, 16, 20
    imgs = np.zeros((b, h, w, 3), np.float32)
    gt = np.random.default_rng(0).uniform(1, 50, (b, 8, 10)).astype(np.float32)
    pred = gt * 1.1
    grid = viz.triple_grid(imgs, gt, pred, max_rows=2)
    assert grid.shape == (2 * h, 3 * w, 3)  # 2 rows, 3 panels wide
    assert grid.dtype == np.uint8


def test_save_png(tmp_path):
    img = np.zeros((8, 8, 3), np.uint8)
    p = viz.save_png(str(tmp_path / "x" / "g.png"), img)
    assert os.path.exists(p)


def test_train_with_eval_every_and_viz(tmp_path):
    """In-loop eval fires, writes eval_ metrics and a triple PNG."""
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, input_hw=(48, 64)),
        train=dataclasses.replace(
            cfg.train, steps=4, batch_size=2, eval_every=2, log_every=10,
            checkpoint_every=100, warmup_steps=0,
            ckpt_dir=str(tmp_path / "ckpt")),
    )
    looplib.train(cfg, workdir=str(tmp_path), progress=False)
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    eval_lines = [l for l in lines if "eval_rmse" in l]
    assert len(eval_lines) == 2  # steps 2 and 4
    pngs = glob.glob(str(tmp_path / "triples_step*.png"))
    assert len(pngs) == 2


def test_dp_eval_matches_single_device(cpu_mesh):
    """evaluate() over the 8-device mesh == over a 1-device mesh (the
    stats psum is exact up to f32 reduction order)."""
    import jax

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.parallel import mesh as meshlib
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, input_hw=(48, 64)),
        train=dataclasses.replace(cfg.train, batch_size=8, seed=0))
    ds = SyntheticDepthDataset(n=16, seed=1)
    state1 = looplib.create_state(
        cfg, meshlib.create_mesh(jax.devices("cpu")[:1]))
    m1 = looplib.evaluate(cfg, state=state1, dataset=ds,
                          mesh=meshlib.create_mesh(jax.devices("cpu")[:1]))
    state8 = looplib.create_state(cfg, cpu_mesh)
    m8 = looplib.evaluate(cfg, state=state8, dataset=ds, mesh=cpu_mesh)
    for k in m1:
        assert abs(m1[k] - m8[k]) <= 1e-4 * max(1.0, abs(m1[k])), (
            k, m1[k], m8[k])


def test_evaluate_protocols_matches_individual_runs(tmp_path):
    """--protocols (r5): one invocation scoring several protocol variants
    equals the separate-invocation results, off one restored state (and
    one staged pool under cache-device)."""
    import dataclasses

    import numpy as np
    import pytest

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, input_hw=(48, 64)),
        train=dataclasses.replace(cfg.train, batch_size=4,
                                  ckpt_dir=str(tmp_path / "c")))
    state = looplib.create_state(cfg)
    grid = looplib.evaluate_protocols(
        cfg, ["plain", "tta", "tta+align+crop"], state=state,
        max_batches=2)
    assert set(grid) == {"plain", "tta", "tta+align+crop"}
    plain = looplib.evaluate(cfg, state=state, max_batches=2)
    tta = looplib.evaluate(cfg, state=state, max_batches=2, tta="flip")
    full = looplib.evaluate(cfg, state=state, max_batches=2, tta="flip",
                            align="median", crop="eigen")
    for tok, want in (("plain", plain), ("tta", tta),
                      ("tta+align+crop", full)):
        for k in want:
            assert grid[tok][k] == pytest.approx(want[k], rel=1e-5), \
                (tok, k)
    assert grid["plain"]["rmse"] != pytest.approx(grid["tta"]["rmse"])
    with pytest.raises(ValueError, match="unknown protocol"):
        looplib.evaluate_protocols(cfg, ["tta+bogus"], state=state)
    with pytest.raises(ValueError, match="non-empty"):
        looplib.evaluate_protocols(cfg, [], state=state)


def test_cli_eval_protocols(tmp_path, capsys):
    import json

    import numpy as np

    from ann3depth_tpu.cli import main

    rc = main(["train", "--config", "smoke", "--steps", "2",
               "--batch-size", "2", "--ckpt-dir", str(tmp_path / "c"),
               "--workdir", str(tmp_path / "w")])
    assert rc == 0
    rc = main(["eval", "--config", "smoke", "--batch-size", "2",
               "--ckpt-dir", str(tmp_path / "c"), "--max-batches", "1",
               "--protocols", "plain,tta"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {"plain", "tta"}
    assert all(np.isfinite(m["rmse"]) for m in out.values())


def test_evaluate_protocols_shares_cache_device_pool(tmp_path, monkeypatch):
    """Under cache_device, the protocol grid stages the test pool ONCE
    and every variant gathers from it (the r5 feature's whole point);
    values still equal the host-path results."""
    import dataclasses

    import pytest

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.pipeline import device_cache
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, input_hw=(48, 64),
                                 cache_device=True),
        train=dataclasses.replace(cfg.train, batch_size=4,
                                  ckpt_dir=str(tmp_path / "c")))
    state = looplib.create_state(cfg)

    built = {"n": 0}
    real = device_cache.DevicePoolSampler

    def _spy(*a, **k):
        built["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(device_cache, "DevicePoolSampler", _spy)
    monkeypatch.setattr(
        "ann3depth_tpu.train.loop.DevicePoolSampler", _spy, raising=False)
    # Full split: the pool iterates per-shard, the host feed in split
    # order — only the FULL split's order-invariant global sums are
    # comparable across the two (evaluate's docstring note).
    grid = looplib.evaluate_protocols(cfg, ["plain", "tta"], state=state)
    assert built["n"] == 1, "protocol grid must stage exactly one pool"

    host_cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, cache_device=False))
    plain = looplib.evaluate(host_cfg, state=state)
    for k in plain:
        assert grid["plain"][k] == pytest.approx(plain[k], rel=1e-4), k
    assert grid["tta"]["rmse"] != pytest.approx(grid["plain"]["rmse"])
