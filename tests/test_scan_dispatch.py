"""Scanned K-step dispatch (train/loop.py steps_per_dispatch): the
benchmarks' scan-of-K promoted to the real train loop for cache-device
runs. Equality with the per-step loop, cadence/compat validation, and
resume alignment."""

import dataclasses

import jax
import numpy as np
import pytest

from ann3depth_tpu.config import get_config


def _cfg(tmp_path, sub, **train_over):
    cfg = get_config("smoke")
    data_over = {"cache_device": True, **train_over.pop("data", {})}
    train_kw = {"steps": 8, "batch_size": 8, "seed": 7,
                "ckpt_dir": str(tmp_path / sub), "checkpoint_every": 8,
                "log_every": 4, "eval_every": 0, **train_over}
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, **data_over),
        train=dataclasses.replace(cfg.train, **train_kw))


def test_scan_dispatch_matches_per_step_loop(tmp_path, cpu_mesh):
    """Same seed, same pool sampling stream, same number of steps: the
    K=4-block run must land on the per-step run's parameters (the scan
    inlines the identical step program; only scheduling changes)."""
    from ann3depth_tpu.train import loop as looplib

    s1, m1 = looplib.train(_cfg(tmp_path, "a"),
                           workdir=str(tmp_path / "wa"), progress=False)
    s2, m2 = looplib.train(_cfg(tmp_path, "b", steps_per_dispatch=4),
                           workdir=str(tmp_path / "wb"), progress=False)
    assert int(s1.step) == int(s2.step) == 8
    leaves1 = jax.tree.leaves(jax.device_get(s1.params))
    leaves2 = jax.tree.leaves(jax.device_get(s2.params))
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    assert np.isclose(m1["loss"], m2["loss"], rtol=2e-4)


def test_index_blocks_walk_the_same_stream(cpu_mesh):
    """index_blocks(k) is __iter__'s sampling order, grouped: k rows of
    the block equal the k per-step index vectors at the same seed."""
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.pipeline.device_cache import DevicePoolSampler

    ds = SyntheticDepthDataset(n=32, img_hw=(16, 16), depth_hw=(8, 8))
    a = DevicePoolSampler(ds, 8, cpu_mesh, steps=6, seed=3)
    b = DevicePoolSampler(ds, 8, cpu_mesh, steps=6, seed=3)
    per_step = list(a._local_index_stream())
    blocks = [np.asarray(jax.device_get(x)) for x in b.index_blocks(3)]
    assert len(blocks) == 2 and blocks[0].shape[0] == 3
    np.testing.assert_array_equal(np.concatenate(blocks), np.stack(per_step))
    a.close(), b.close()


def test_scan_dispatch_requires_cache_device(tmp_path):
    from ann3depth_tpu.train import loop as looplib

    cfg = _cfg(tmp_path, "c", steps_per_dispatch=4,
               data={"cache_device": False})
    with pytest.raises(ValueError, match="cache-device"):
        looplib.train(cfg, workdir=str(tmp_path / "wc"), progress=False)


def test_scan_dispatch_rejects_misaligned_cadence(tmp_path):
    from ann3depth_tpu.train import loop as looplib

    cfg = _cfg(tmp_path, "d", steps_per_dispatch=4, log_every=6)
    with pytest.raises(ValueError, match="log_every=6"):
        looplib.train(cfg, workdir=str(tmp_path / "wd"), progress=False)


def test_scan_dispatch_resume_continues_block_aligned(tmp_path, cpu_mesh):
    """Train 4 of 8 steps (one block), kill, resume: the step counter
    continues and the remaining block runs."""
    from ann3depth_tpu.train import loop as looplib

    cfg = _cfg(tmp_path, "e", steps_per_dispatch=4, checkpoint_every=4)
    half = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps=4))
    looplib.train(half, workdir=str(tmp_path / "we"), progress=False)
    full = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resume=True))
    state, metrics = looplib.train(full, workdir=str(tmp_path / "we"),
                                   progress=False)
    assert int(state.step) == 8
    assert np.isfinite(metrics["loss"])


def test_scan_dispatch_composes_with_grad_accum(tmp_path, cpu_mesh):
    """K-blocks of accumulated steps: scan-inside-scan. Must match the
    per-step grad-accum run (same stream, same microbatching)."""
    from ann3depth_tpu.train import loop as looplib

    s1, _ = looplib.train(_cfg(tmp_path, "ga1", grad_accum=2),
                          workdir=str(tmp_path / "wga1"), progress=False)
    s2, _ = looplib.train(
        _cfg(tmp_path, "ga2", grad_accum=2, steps_per_dispatch=4),
        workdir=str(tmp_path / "wga2"), progress=False)
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_scan_dispatch_composes_with_zero1(tmp_path, cpu_mesh):
    """The inner-step closure wraps zstep: a ZeRO-1 run under K-dispatch
    trains, checkpoints, and lands near the per-step ZeRO-1 run."""
    from ann3depth_tpu.train import loop as looplib

    s1, m1 = looplib.train(_cfg(tmp_path, "z1", zero1=True),
                           workdir=str(tmp_path / "wz1"), progress=False)
    s2, m2 = looplib.train(
        _cfg(tmp_path, "z2", zero1=True, steps_per_dispatch=4),
        workdir=str(tmp_path / "wz2"), progress=False)
    assert int(s2.step) == 8 and np.isfinite(m2["loss"])
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_scan_dispatch_with_inloop_eval(tmp_path, cpu_mesh):
    """eval_every at a block boundary fires between dispatches."""
    import json

    from ann3depth_tpu.train import loop as looplib

    cfg = _cfg(tmp_path, "ev", steps_per_dispatch=4, eval_every=4)
    state, _ = looplib.train(cfg, workdir=str(tmp_path / "wev"),
                             progress=False)
    assert int(state.step) == 8
    rows = [json.loads(l) for l in
            open(tmp_path / "wev" / "metrics.jsonl")]
    eval_steps = [r["step"] for r in rows if "eval_rmse" in r]
    assert eval_steps == [4, 8]
