"""Loader tests on tiny synthetic fixtures (SURVEY §4.1): Make3D-format
.mat+jpg trees, NYU-format HDF5 mats, and packed record shards."""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def make3d_tree(tmp_path):
    """Fabricate a miniature Make3D on-disk tree (3 train, 2 test pairs)."""
    import scipy.io
    from PIL import Image

    rng = np.random.default_rng(0)
    base = tmp_path / "make3d"
    for split, n, imgdir, depdir in [
        ("train", 3, "Train400Img", "Train400Depth"),
        ("test", 2, "Test134", "Gridlaserdata"),
    ]:
        (base / imgdir).mkdir(parents=True)
        (base / depdir).mkdir(parents=True)
        for i in range(n):
            sid = f"{split}scene-{i:03d}"
            img = rng.integers(0, 256, (96, 72, 3), dtype=np.uint8)
            Image.fromarray(img).save(base / imgdir / f"img-{sid}.jpg")
            # Make3D stores Position3DGrid (55, 305, 4), depth in channel 3
            grid = np.zeros((55, 305, 4), np.float32)
            grid[..., 3] = rng.uniform(1, 70, (55, 305))
            scipy.io.savemat(base / depdir / f"depth_sph_corr-{sid}.mat",
                             {"Position3DGrid": grid})
    # one unpaired image must be skipped, not crash
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        base / "Train400Img" / "img-orphan.jpg")
    return tmp_path


def test_make3d_loader_pairs_and_shapes(make3d_tree):
    from ann3depth_tpu.data.make3d import Make3DDataset

    ds = Make3DDataset(str(make3d_tree), split="train", raw_hw=(48, 64))
    assert len(ds) == 3  # orphan dropped
    img, depth = ds[0]
    assert img.shape == (48, 64, 3) and img.dtype == np.uint8
    assert depth.shape == (305, 55) and depth.dtype == np.float32
    assert depth.min() >= 1.0 and depth.max() <= 70.0

    ds_test = Make3DDataset(str(make3d_tree), split="test", raw_hw=(48, 64))
    assert len(ds_test) == 2


def test_make3d_batches(make3d_tree):
    from ann3depth_tpu.data.make3d import Make3DDataset

    ds = Make3DDataset(str(make3d_tree), split="train", raw_hw=(48, 64))
    batches = list(ds.batches(2, steps=3, seed=1))
    assert len(batches) == 3
    imgs, deps = batches[0]
    assert imgs.shape == (2, 48, 64, 3) and deps.shape == (2, 305, 55)


def test_make3d_missing_dir_raises(tmp_path):
    from ann3depth_tpu.data.make3d import Make3DDataset

    with pytest.raises(FileNotFoundError, match="download"):
        Make3DDataset(str(tmp_path), split="train")


def test_make3d_depth_mat_transposed_variant(tmp_path):
    """Test134 half stores (305,55,4); loader canonicalizes either way."""
    import scipy.io
    from ann3depth_tpu.data.make3d import load_depth_mat

    grid = np.zeros((305, 55, 4), np.float32)
    grid[..., 3] = 5.0
    p = tmp_path / "d.mat"
    scipy.io.savemat(p, {"Position3DGrid": grid})
    d = load_depth_mat(str(p))
    assert d.shape == (305, 55)


@pytest.fixture()
def nyu_mat(tmp_path):
    import h5py

    rng = np.random.default_rng(1)
    p = tmp_path / "nyu" / "nyu_depth_v2_labeled.mat"
    p.parent.mkdir(parents=True)
    n, H, W = 6, 48, 64
    with h5py.File(p, "w") as f:
        # NYU stores (N, 3, W, H) images and (N, W, H) depths
        f.create_dataset("images", data=rng.integers(
            0, 256, (n, 3, W, H), dtype=np.uint8))
        f.create_dataset("depths", data=rng.uniform(
            0.5, 10.0, (n, W, H)).astype(np.float32))
    return tmp_path


def test_nyu_loader(nyu_mat):
    from ann3depth_tpu.data.nyu import NYUDataset

    tr = NYUDataset(str(nyu_mat), split="train")
    te = NYUDataset(str(nyu_mat), split="test")
    assert len(tr) == 3 and len(te) == 3
    img, depth = tr[0]
    assert img.shape == (48, 64, 3) and img.dtype == np.uint8
    assert depth.shape == (48, 64) and depth.dtype == np.float32
    imgs, deps = next(tr.batches(2, steps=1))
    assert imgs.shape == (2, 48, 64, 3) and deps.shape == (2, 48, 64)
    tr.close(); te.close()


def test_nyu_missing_raises(tmp_path):
    from ann3depth_tpu.data.nyu import NYUDataset

    with pytest.raises(FileNotFoundError, match="download"):
        NYUDataset(str(tmp_path))


def test_nyu_official_splits_mat(nyu_mat):
    """splits.mat (1-based trainNdxs/testNdxs) wins over any fallback."""
    import scipy.io

    from ann3depth_tpu.data.nyu import NYUDataset

    scipy.io.savemat(
        str(nyu_mat / "nyu" / "splits.mat"),
        {"trainNdxs": np.array([[1], [2], [4], [6]]),  # 1-based MATLAB
         "testNdxs": np.array([[3], [5]])})
    tr = NYUDataset(str(nyu_mat), split="train")
    te = NYUDataset(str(nyu_mat), split="test")
    np.testing.assert_array_equal(tr.indices, [0, 1, 3, 5])
    np.testing.assert_array_equal(te.indices, [2, 4])
    tr.close(); te.close()


def test_nyu_scene_split_no_leakage(tmp_path):
    """Without splits.mat, whole scenes alternate: no scene appears in both
    splits (consecutive same-scene frames must not leak, ADVICE r1)."""
    import h5py

    from ann3depth_tpu.data.nyu import NYUDataset

    rng = np.random.default_rng(3)
    p = tmp_path / "nyu" / "nyu_depth_v2_labeled.mat"
    p.parent.mkdir(parents=True)
    scenes = ["kitchen_0001"] * 3 + ["office_0002"] * 2 + ["bedroom_0003"] * 3
    n, H, W = len(scenes), 16, 20
    with h5py.File(p, "w") as f:
        f.create_dataset("images", data=rng.integers(
            0, 256, (n, 3, W, H), dtype=np.uint8))
        f.create_dataset("depths", data=rng.uniform(
            0.5, 10.0, (n, W, H)).astype(np.float32))
        refs = []
        for i, s in enumerate(scenes):
            d = f.create_dataset(
                f"#refs#/s{i}",
                data=np.array([[ord(c)] for c in s], dtype=np.uint16))
            refs.append(d.ref)
        f.create_dataset("scenes", data=np.array(
            refs, dtype=h5py.ref_dtype).reshape(1, -1))
    tr = NYUDataset(str(tmp_path), split="train")
    te = NYUDataset(str(tmp_path), split="test")
    # scenes 0,2 (kitchen, bedroom) -> train; scene 1 (office) -> test
    np.testing.assert_array_equal(tr.indices, [0, 1, 2, 5, 6, 7])
    np.testing.assert_array_equal(te.indices, [3, 4])
    tr.close(); te.close()


def test_nyu_image_fallback_warns(nyu_mat, caplog):
    import logging

    from ann3depth_tpu.data.nyu import NYUDataset

    with caplog.at_level(logging.WARNING, logger="ann3depth_tpu.data.nyu"):
        ds = NYUDataset(str(nyu_mat), split="train")
    assert any("every-other-IMAGE" in r.message for r in caplog.records)
    ds.close()


def test_download_staged_archive_verified_and_extracted(tmp_path, monkeypatch):
    """Pre-staged (offline) archives are integrity-checked, extracted, and
    the resulting tree layout-verified."""
    import io
    import tarfile

    from ann3depth_tpu.data import download as dl
    from PIL import Image
    import scipy.io

    # Build a miniature Make3D archive set in the staging location.
    base = tmp_path / "make3d"
    base.mkdir()
    src = tmp_path / "src"
    for d in ("Train400Img", "Train400Depth", "Test134", "Gridlaserdata"):
        (src / d).mkdir(parents=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        src / "Train400Img" / "img-a.jpg")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        src / "Test134" / "img-b.jpg")
    grid = np.zeros((55, 305, 4), np.float32)
    scipy.io.savemat(src / "Train400Depth" / "depth_sph_corr-a.mat",
                     {"Position3DGrid": grid})
    scipy.io.savemat(src / "Gridlaserdata" / "depth_sph_corr-b.mat",
                     {"Position3DGrid": grid})
    names = ["Train400Img.tar.gz", "Train400Depth.tgz", "Test134.tar.gz",
             "Test134Depth.tar.gz"]
    dirs = [["Train400Img"], ["Train400Depth"], ["Test134"], ["Gridlaserdata"]]
    for name, subdirs in zip(names, dirs):
        with tarfile.open(base / name, "w:gz") as tf:
            for d in subdirs:
                tf.add(src / d, arcname=d)
    dl.download("make3d", str(tmp_path))  # offline: uses staged archives
    assert (base / "Train400Img" / "img-a.jpg").exists()
    assert (base / "Gridlaserdata" / "depth_sph_corr-b.mat").exists()


def test_download_truncated_archive_fails_fast(tmp_path):
    import tarfile

    from ann3depth_tpu.data import download as dl

    base = tmp_path / "make3d"
    base.mkdir()
    # a valid gzip stream holding garbage (not a tar)
    import gzip

    with gzip.open(base / "Train400Img.tar.gz", "wb") as f:
        f.write(b"this is not a tarball")
    with pytest.raises(RuntimeError, match="corrupt or truncated"):
        dl._verify_archive(str(base / "Train400Img.tar.gz"))


def test_download_bad_mat_magic_fails(tmp_path):
    from ann3depth_tpu.data import download as dl

    p = tmp_path / "nyu_depth_v2_labeled.mat"
    p.write_bytes(b"MATLAB 5.0 MAT-file junk header")
    with pytest.raises(RuntimeError, match="HDF5"):
        dl._verify_archive(str(p))


def test_download_checksum_enforced_when_known(tmp_path, monkeypatch):
    from ann3depth_tpu.data import download as dl

    p = tmp_path / "Test134.tar.gz"
    p.write_bytes(b"anything")
    monkeypatch.setitem(dl.CHECKSUMS, "Test134.tar.gz", "0" * 64)
    with pytest.raises(RuntimeError, match="sha256 mismatch"):
        dl._verify_archive(str(p))


def test_download_layout_verification_reports_missing(tmp_path):
    from ann3depth_tpu.data import download as dl

    (tmp_path / "make3d" / "Train400Img").mkdir(parents=True)
    with pytest.raises(RuntimeError, match="incomplete"):
        dl._verify_layout("make3d", str(tmp_path / "make3d"))


def test_interleave_batches_round_robin_mixed_shapes():
    """Multi-dataset training interleaves WHOLE batches so each batch stays
    shape-uniform even when sources differ (Make3D vs NYU raw grids)."""
    from ann3depth_tpu.data.batching import interleave_batches
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset

    a = SyntheticDepthDataset(n=8, img_hw=(16, 16), depth_hw=(8, 8), seed=0)
    b = SyntheticDepthDataset(n=8, img_hw=(24, 32), depth_hw=(12, 16), seed=1)
    batches = list(interleave_batches([a, b], 4, steps=6, seed=0))
    assert len(batches) == 6
    shapes = [img.shape for img, _ in batches]
    assert shapes == [(4, 16, 16, 3), (4, 24, 32, 3)] * 3  # strict round-robin


def test_interleave_batches_exhausts_on_epoch():
    from ann3depth_tpu.data.batching import interleave_batches
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset

    a = SyntheticDepthDataset(n=8, img_hw=(8, 8), depth_hw=(4, 4))
    b = SyntheticDepthDataset(n=4, img_hw=(8, 8), depth_hw=(4, 4))
    # steps=None -> one epoch per source: 2 + 1 = 3 batches
    assert len(list(interleave_batches([a, b], 4, steps=None))) == 3


def test_records_pack_empty_raises(tmp_path):
    from ann3depth_tpu.data.records import pack
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset

    src = SyntheticDepthDataset(n=0, img_hw=(8, 8), depth_hw=(4, 4))
    with pytest.raises(ValueError, match="empty"):
        pack(src, str(tmp_path / "rec"), "train")


def test_cli_prepare_synthetic(tmp_path, capsys):
    """`prepare` packs a dataset; training then picks up the records."""
    import json

    from ann3depth_tpu.cli import main

    rc = main(["prepare", "--dataset", "synthetic",
               "--data-dir", str(tmp_path), "--shard-size", "32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["examples"] == 64 and os.path.exists(out["index"])

    from ann3depth_tpu.data.records import RecordDataset
    packed = RecordDataset(out["index"])
    assert len(packed) == 64


def test_build_dataset_prefers_records(tmp_path):
    import dataclasses

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.records import pack
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.train.loop import build_dataset

    src = SyntheticDepthDataset(n=6, img_hw=(16, 16), depth_hw=(8, 8))
    src.name = "make3d"  # pretend these are packed make3d records
    pack(src, str(tmp_path / "records"), "train", shard_size=4)

    cfg = get_config("make3d-encdec")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, data_dir=str(tmp_path)))
    ds = build_dataset(cfg, "train")  # raw tree absent -> records win
    assert len(ds) == 6


@pytest.mark.parametrize("fmt", ["npy", "npz"])
def test_records_pack_roundtrip(tmp_path, fmt):
    from ann3depth_tpu.data.records import RecordDataset, pack
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset

    src = SyntheticDepthDataset(n=10, img_hw=(24, 32), depth_hw=(12, 16))
    index = pack(src, str(tmp_path / "rec"), "train", shard_size=4,
                 format=fmt)
    assert os.path.exists(index)
    packed = RecordDataset(index)
    assert len(packed) == 10
    for i in (0, 4, 9):  # npz: spans all three shards
        a_img, a_dep = src[i]
        b_img, b_dep = packed[i]
        np.testing.assert_array_equal(a_img, b_img)
        np.testing.assert_array_equal(a_dep, b_dep)
    imgs, deps = next(packed.batches(3, steps=1, shuffle=False))
    assert imgs.shape == (3, 24, 32, 3)
    assert imgs.dtype == np.uint8 and deps.dtype == np.float32
    idx = json.load(open(index))
    assert idx["total"] == 10
    if fmt == "npz":
        assert len(idx["shards"]) == 3
    else:
        assert idx["format"] == "npy" and "shards" not in idx


def test_records_npy_npz_same_batches(tmp_path):
    """The gather fast path (npy memmap fancy-indexing, batching.py) must
    yield bitwise the same shuffled epoch as the per-item npz path."""
    from ann3depth_tpu.data.records import RecordDataset, pack
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset

    src = SyntheticDepthDataset(n=12, img_hw=(16, 16), depth_hw=(8, 8))
    a = RecordDataset(pack(src, str(tmp_path / "a"), "train", format="npy"))
    b = RecordDataset(pack(src, str(tmp_path / "b"), "train", format="npz",
                           shard_size=5))
    assert a.gather is not None and b.gather is None
    for (ai, ad), (bi, bd) in zip(a.batches(4, steps=6, seed=3),
                                  b.batches(4, steps=6, seed=3)):
        np.testing.assert_array_equal(ai, bi)
        np.testing.assert_array_equal(ad, bd)


def test_records_npy_interrupted_pack_unreadable(tmp_path):
    """The index commits the pack (written last, atomically): data files
    without an index must not look like a dataset; a stale index over a
    truncated data file must fail loudly at open."""
    import os as _os

    from ann3depth_tpu.data import records
    from ann3depth_tpu.data.records import RecordDataset, pack
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset

    src = SyntheticDepthDataset(n=8, img_hw=(16, 16), depth_hw=(8, 8))
    index = pack(src, str(tmp_path), "train", format="npy")
    assert records.find_index(str(tmp_path), "synthetic", "train")

    # Simulate a crash mid-pack: fewer rows than the index claims.
    import numpy as _np
    imgs_path = str(tmp_path / "synthetic-train-images.npy")
    short = _np.lib.format.open_memmap(
        imgs_path + ".new", mode="w+", dtype=_np.uint8, shape=(3, 16, 16, 3))
    del short
    _os.replace(imgs_path + ".new", imgs_path)
    with pytest.raises(ValueError, match="incomplete"):
        RecordDataset(index)


def test_download_v73_mat_with_userblock_verifies(tmp_path):
    """Real MATLAB v7.3 files put the HDF5 signature at offset 512 (the
    userblock holds MATLAB's text header). The r4 true-scale rehearsal
    caught _verify_archive rejecting exactly that shape; lock the fix."""
    import h5py

    from ann3depth_tpu.data import download as dl

    p = tmp_path / "nyu_depth_v2_labeled.mat"
    with h5py.File(p, "w", userblock_size=512) as f:
        f.create_dataset("depths", data=np.zeros((2, 4, 3), np.float32))
    with open(p, "r+b") as f:
        f.write(b"MATLAB 7.3 MAT-file".ljust(116, b" "))
        f.seek(124)
        f.write(b"\x00\x02IM")
    dl._verify_archive(str(p))  # must not raise


def test_recorded_checksums_become_hard_gates(tmp_path):
    """`download --record-checksums` writes sha256s next to the archives;
    later verifies enforce them, so silent corruption/replacement of a
    staged archive fails fast with the recording named as the source."""
    import io
    import tarfile

    from ann3depth_tpu.data import download as dl

    base = tmp_path / "make3d"
    base.mkdir()
    p = base / "Test134.tar.gz"
    with tarfile.open(p, "w:gz") as tf:
        ti = tarfile.TarInfo("Test134/img-test0000.jpg")
        ti.size = 3
        tf.addfile(ti, io.BytesIO(b"abc"))
    dl._verify_archive(str(p))  # no gate yet
    rec = dl.record_checksums("make3d", str(tmp_path))
    assert "Test134.tar.gz" in rec
    dl._verify_archive(str(p))  # matches its own recording
    # corrupt-in-place: same name, different bytes (still a valid tarball)
    with tarfile.open(p, "w:gz") as tf:
        ti = tarfile.TarInfo("Test134/img-test0000.jpg")
        ti.size = 3
        tf.addfile(ti, io.BytesIO(b"xyz"))
    with pytest.raises(RuntimeError, match="sha256 mismatch.*checksums.json"):
        dl._verify_archive(str(p))


def test_builtin_checksums_outrank_recorded(tmp_path, monkeypatch):
    import json

    from ann3depth_tpu.data import download as dl

    base = tmp_path / "make3d"
    base.mkdir()
    p = base / "Test134.tar.gz"
    p.write_bytes(b"payload")
    (base / dl.RECORDED_NAME).write_text(
        json.dumps({"Test134.tar.gz": dl._sha256(str(p))}))
    monkeypatch.setitem(dl.CHECKSUMS, "Test134.tar.gz", "0" * 64)
    with pytest.raises(RuntimeError, match="builtin CHECKSUMS"):
        dl._verify_archive(str(p))


def test_records_npy_truncated_depths_fail_loudly(tmp_path):
    """Open-time validation must cover BOTH memmaps: a crash that truncates
    only the depths file would otherwise surface as an opaque IndexError
    from the gather fancy-index mid-epoch."""
    import os as _os

    import numpy as _np

    from ann3depth_tpu.data.records import RecordDataset, pack
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset

    src = SyntheticDepthDataset(n=8, img_hw=(16, 16), depth_hw=(8, 8))
    index = pack(src, str(tmp_path), "train", format="npy")
    deps_path = str(tmp_path / "synthetic-train-depths.npy")
    short = _np.lib.format.open_memmap(
        deps_path + ".new", mode="w+", dtype=_np.float32, shape=(3, 8, 8))
    del short
    _os.replace(deps_path + ".new", deps_path)
    with pytest.raises(ValueError, match="depths row count.*incomplete"):
        RecordDataset(index)


def test_records_npy_pickles_by_path_not_by_buffer(tmp_path):
    """np.memmap pickles as a FULL ndarray, so a RecordDataset shipped to
    grain worker processes (--use-grain --num-workers N) would copy the
    whole packed dataset into every worker; it must pickle as just the
    index path and reopen its own memmaps."""
    import pickle

    from ann3depth_tpu.data.records import RecordDataset, pack
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset

    src = SyntheticDepthDataset(n=64, img_hw=(32, 32), depth_hw=(16, 16))
    ds = RecordDataset(pack(src, str(tmp_path), "train", format="npy"))
    data_bytes = ds._imgs.nbytes + ds._deps.nbytes
    blob = pickle.dumps(ds)
    assert len(blob) < data_bytes // 10, (
        f"pickle is {len(blob)} bytes for {data_bytes} bytes of data — "
        "the memmap buffers leaked into the pickle")
    ds2 = pickle.loads(blob)
    for (ai, ad), (bi, bd) in zip(ds.batches(4, steps=3, seed=1),
                                  ds2.batches(4, steps=3, seed=1)):
        np.testing.assert_array_equal(ai, bi)
        np.testing.assert_array_equal(ad, bd)
