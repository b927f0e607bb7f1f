"""HBM-resident dataset cache (pipeline/device_cache.py): shard-local
gather correctness on the fake 8-device mesh, and end-to-end training
through loop.train with cache_device=True."""

import dataclasses

import jax
import numpy as np
import pytest

from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
from ann3depth_tpu.pipeline.device_cache import DevicePoolSampler


def test_batches_are_sharded_and_from_the_pool(cpu_mesh):
    ds = SyntheticDepthDataset(n=32, img_hw=(24, 32), depth_hw=(12, 16))
    sampler = DevicePoolSampler(ds, 8, cpu_mesh, steps=6, seed=0)
    n_dev = cpu_mesh.devices.size
    all_imgs = np.stack([ds[i][0] for i in range(32)])
    seen = 0
    for img, dep in sampler:
        assert img.shape == (8, 24, 32, 3) and dep.shape == (8, 12, 16)
        assert "data" in str(img.sharding.spec)
        # every yielded example must be an actual pool example, and block d
        # must come from shard d (shard-local sampling)
        img_np = np.asarray(jax.device_get(img))
        shard = 32 // n_dev
        per_dev = 8 // n_dev
        for k in range(8):
            d = k // per_dev
            cand = all_imgs[d * shard:(d + 1) * shard]
            assert (cand == img_np[k]).all(axis=(1, 2, 3)).any(), (
                f"row {k} not found in shard {d}")
        seen += 1
    assert seen == 6
    sampler.close()


def test_epoch_covers_each_shard_without_replacement(cpu_mesh):
    ds = SyntheticDepthDataset(n=16, img_hw=(16, 16), depth_hw=(8, 8))
    n_dev = cpu_mesh.devices.size
    shard = 16 // n_dev  # 2 examples per shard
    sampler = DevicePoolSampler(ds, n_dev, cpu_mesh, steps=shard, seed=0)
    rows = [np.asarray(jax.device_get(img)) for img, _ in sampler]
    # per device: the `shard` examples of one epoch are distinct
    all_imgs = np.stack([ds[i][0] for i in range(16)])
    for d in range(n_dev):
        got = [r[d] for r in rows]  # per_dev = 1
        idxs = set()
        for g in got:
            (i,) = np.nonzero((all_imgs == g).all(axis=(1, 2, 3)))[0][:1]
            idxs.add(int(i))
        assert len(idxs) == shard, "epoch repeated an example within a shard"


def test_train_loop_with_cache_device(tmp_path, cpu_mesh):
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, cache_device=True),
        train=dataclasses.replace(
            cfg.train, steps=8, batch_size=8, ckpt_dir=str(tmp_path / "c"),
            checkpoint_every=8, log_every=4))
    state, metrics = looplib.train(cfg, workdir=str(tmp_path / "w"),
                                   progress=False)
    assert int(state.step) == 8
    assert np.isfinite(metrics["loss"])


def test_oversized_batch_raises(cpu_mesh):
    ds = SyntheticDepthDataset(n=16, img_hw=(16, 16), depth_hw=(8, 8))
    # per_dev = 32/8 = 4 > shard = 16/8 = 2 -> must error, not spin
    with pytest.raises(ValueError, match="per device"):
        DevicePoolSampler(ds, 32, cpu_mesh)
    with pytest.raises(ValueError, match="positive"):
        DevicePoolSampler(ds, 0, cpu_mesh)


def test_steps_none_is_one_epoch(cpu_mesh):
    ds = SyntheticDepthDataset(n=16, img_hw=(16, 16), depth_hw=(8, 8))
    sampler = DevicePoolSampler(ds, 8, cpu_mesh, steps=None, seed=0)
    n_dev = cpu_mesh.devices.size
    # shard = 2, per_dev = 1 -> one epoch = 2 batches
    assert sum(1 for _ in sampler) == (16 // n_dev) // (8 // n_dev)


def test_cache_device_from_packed_records(tmp_path, cpu_mesh):
    """The production flow: `prepare` packs shards once, cache_device
    stages them into HBM (records.RecordDataset speaks the loader
    protocol DevicePoolSampler needs)."""
    from ann3depth_tpu.data.records import RecordDataset, pack

    ds = SyntheticDepthDataset(n=16, img_hw=(24, 32), depth_hw=(12, 16))
    index = pack(ds, str(tmp_path), "train", shard_size=5)
    rec = RecordDataset(index)
    sampler = DevicePoolSampler(rec, 8, cpu_mesh, steps=2, seed=0)
    batches = list(sampler)
    assert len(batches) == 2
    img, dep = batches[0]
    assert img.shape == (8, 24, 32, 3) and dep.shape == (8, 12, 16)
    sampler.close()


def test_cache_device_rejects_grain_combo(tmp_path):
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, cache_device=True, use_grain=True),
        train=dataclasses.replace(cfg.train, steps=2, batch_size=8,
                                  ckpt_dir=str(tmp_path / "c")))
    with pytest.raises(ValueError, match="exclusive"):
        looplib.train(cfg, workdir=str(tmp_path / "w"), progress=False)


def test_fixed_batches_deterministic_and_matches_host_eval(tmp_path):
    """fixed_batches yields the SAME batches every call (the in-loop eval's
    fixed sample), and on a single-device mesh the device-resident eval
    equals the host-fed eval bitwise (identical examples, identical
    program)."""
    import jax

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.parallel import mesh as meshlib
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=4))
    mesh = meshlib.create_mesh([jax.devices()[0]])
    ds = SyntheticDepthDataset(n=16, img_hw=cfg.data.input_hw,
                               depth_hw=(cfg.data.input_hw[0] // 2,
                                         cfg.data.input_hw[1] // 2))
    sampler = DevicePoolSampler(ds, 4, mesh, steps=0, seed=0)
    a = [jax.device_get(img) for img, _ in sampler.fixed_batches(2)]
    b = [jax.device_get(img) for img, _ in sampler.fixed_batches(2)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

    state = looplib.create_state(cfg, mesh)
    host = looplib.evaluate(cfg, state=state, dataset=ds, max_batches=2,
                            mesh=mesh)
    dev = looplib.evaluate(cfg, state=state, dataset=ds, max_batches=2,
                           mesh=mesh,
                           device_batches=sampler.fixed_batches(2))
    assert host == dev
    sampler.close()


def test_inloop_eval_uses_device_pool_on_cache_device(tmp_path, cpu_mesh):
    """A --cache-device run with eval_every writes in-loop eval rows
    scored from the resident eval pool (and tiny splits fall back to the
    host feed without failing the run)."""
    import json

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, cache_device=True),
        train=dataclasses.replace(
            cfg.train, steps=4, batch_size=8, eval_every=2, log_every=2,
            checkpoint_every=4, ckpt_dir=str(tmp_path / "c")))
    looplib.train(cfg, workdir=str(tmp_path / "w"), progress=False)
    rows = [json.loads(l) for l in open(tmp_path / "w" / "metrics.jsonl")]
    evals = [r for r in rows if "eval_rmse" in r]
    assert [r["step"] for r in evals] == [2, 4]
    assert all(np.isfinite(r["eval_rmse"]) for r in evals)


def test_cli_eval_cache_device_equals_host_eval(tmp_path):
    """`eval --cache-device`: evaluate() stages its own pool and must
    reproduce the host-fed metrics exactly on a single-device mesh
    (same examples, same order, same program)."""
    import jax

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.parallel import mesh as meshlib
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=4))
    mesh = meshlib.create_mesh([jax.devices()[0]])
    ds = SyntheticDepthDataset(n=12, img_hw=cfg.data.input_hw,
                               depth_hw=(cfg.data.input_hw[0] // 2,
                                         cfg.data.input_hw[1] // 2))
    state = looplib.create_state(cfg, mesh)
    host = looplib.evaluate(cfg, state=state, dataset=ds, mesh=mesh)
    cfg_cd = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, cache_device=True))
    dev = looplib.evaluate(cfg_cd, state=state, dataset=ds, mesh=mesh)
    assert host == dev


def test_chunked_staging_matches_dataset(cpu_mesh):
    """Pool contents are exactly dataset rows [0, n) regardless of how many
    staging chunks the host-RAM bound forces (r4: streamed staging via
    make_array_from_single_device_arrays replaced the full host stack)."""
    ds = SyntheticDepthDataset(n=24, img_hw=(16, 16), depth_hw=(8, 8))
    ex_bytes = ds[0][0].nbytes + ds[0][1].nbytes
    # 3 examples per chunk -> each 8-device shard (3 rows) needs exactly
    # one chunk; 1 example per chunk -> 3 chunks per shard incl. the
    # donated-update path at nonzero offsets.
    for chunk_bytes in (3 * ex_bytes, ex_bytes):
        sampler = DevicePoolSampler(ds, 8, cpu_mesh, steps=1, seed=0,
                                    stage_chunk_bytes=chunk_bytes)
        img = np.asarray(jax.device_get(sampler.pool_img))
        dep = np.asarray(jax.device_get(sampler.pool_dep))
        ref_img = np.stack([ds[i][0] for i in range(24)])
        ref_dep = np.stack([ds[i][1] for i in range(24)])
        np.testing.assert_array_equal(img, ref_img)
        np.testing.assert_array_equal(dep, ref_dep)
        sampler.close()


def test_chunked_staging_matches_dataset_dp_x_tp():
    """Replica devices (tp axis) hold identical shard content; the global
    pool still reads back as the dataset in row order."""
    from ann3depth_tpu.parallel import mesh as meshlib

    mesh = meshlib.create_mesh_2d(4, 2)
    ds = SyntheticDepthDataset(n=16, img_hw=(16, 16), depth_hw=(8, 8))
    ex_bytes = ds[0][0].nbytes + ds[0][1].nbytes
    sampler = DevicePoolSampler(ds, 8, mesh, steps=1, seed=0,
                                stage_chunk_bytes=2 * ex_bytes)
    img = np.asarray(jax.device_get(sampler.pool_img))
    np.testing.assert_array_equal(
        img, np.stack([ds[i][0] for i in range(16)]))
    # every addressable shard of a data row is a replica of the same block
    shards = {}
    for s in sampler.pool_img.addressable_shards:
        row = s.index[0].start or 0
        if row in shards:
            np.testing.assert_array_equal(np.asarray(s.data),
                                          shards[row])
        else:
            shards[row] = np.asarray(s.data)
    assert len(shards) == 4  # 4 distinct data rows, each replicated x2
    sampler.close()
