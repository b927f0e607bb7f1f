"""Synthesize Make3D/NYU stand-ins at AUTHENTIC dimensions and formats,
staged as the archives data/download.py expects (VERDICT r3 item 3: the
true-scale dress rehearsal — the loaders had only ever seen tiny fixtures).

What "authentic" means here (per the published datasets + SURVEY §2.1):

  Make3D  Train400Img.tar.gz     400x img-*.jpg, 2272x1704 RGB JPEG
          Train400Depth.tgz      400x depth_sph_corr-*.mat, MATLAB v5,
                                 Position3DGrid (55,305,4) float64
          Test134.tar.gz         134x img-*.jpg (same dims)
          Test134Depth.tar.gz    134x *.mat under Gridlaserdata/, stored
                                 in the OTHER orientation (305,55,4) —
                                 both archive halves exist in the wild
                                 and load_depth_mat must canonicalize.
  NYU     nyu_depth_v2_labeled.mat
                                 MATLAB v7.3 = HDF5 with a 512-byte
                                 userblock carrying the MATLAB text
                                 header (the HDF5 signature sits at
                                 offset 512, NOT 0 — this is what real
                                 v7.3 files look like and what tiny
                                 h5py fixtures get wrong); datasets
                                 images (1449,3,640,480) u8,
                                 depths (1449,640,480) f32,
                                 scenes: object refs to char arrays
                                 (consecutive frames share scenes).

Content is smooth low-frequency noise upscaled to full resolution: JPEG
encodes it quickly and at realistic file sizes, and depth stays in each
dataset's physical range. Synthesis is deterministic (seeded).

Usage: python tools/synth_real_scale.py <data_dir> [--nyu-n 1449]
"""

from __future__ import annotations

import argparse
import io
import os
import shutil
import tarfile
import time

import numpy as np

MAKE3D_IMG_WH = (2272, 1704)  # PIL size order (W, H)
NYU_HW = (480, 640)


def _smooth_u8(rng, hw, channels=3, low_hw=(18, 24)):
    """Low-frequency random field upscaled to hw — JPEG-friendly content."""
    from PIL import Image

    small = rng.integers(0, 256, (*low_hw, channels), dtype=np.uint8)
    im = Image.fromarray(small if channels == 3 else small[..., 0])
    im = im.resize((hw[1], hw[0]), Image.BILINEAR)
    a = np.asarray(im, np.uint8)
    return a if channels == 3 else a[..., None]


def _jpeg_bytes(rng) -> bytes:
    from PIL import Image

    w, h = MAKE3D_IMG_WH
    arr = _smooth_u8(rng, (h, w))
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=90)
    return buf.getvalue()


def _depth_mat_bytes(rng, transposed: bool) -> bytes:
    import scipy.io

    grid = np.zeros((305, 55, 4) if transposed else (55, 305, 4), np.float64)
    d = rng.uniform(1.0, 80.0, grid.shape[:2])  # raw laser range, pre-cap
    grid[..., 3] = d
    buf = io.BytesIO()
    scipy.io.savemat(buf, {"Position3DGrid": grid})
    return buf.getvalue()


def _add_bytes(tf: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name)
    info.size = len(data)
    info.mtime = int(time.time())
    tf.addfile(info, io.BytesIO(data))


def synth_make3d(data_dir: str, n_train: int = 400, n_test: int = 134,
                 seed: int = 11) -> None:
    """Write the four Make3D archives under <data_dir>/make3d/."""
    base = os.path.join(data_dir, "make3d")
    os.makedirs(base, exist_ok=True)
    rng = np.random.default_rng(seed)
    specs = [
        ("Train400Img.tar.gz", "Train400Img", "img-train{:04d}.jpg",
         n_train, "jpg", False),
        ("Train400Depth.tgz", "Train400Depth",
         "depth_sph_corr-train{:04d}.mat", n_train, "mat", False),
        ("Test134.tar.gz", "Test134", "img-test{:04d}.jpg",
         n_test, "jpg", False),
        ("Test134Depth.tar.gz", "Gridlaserdata",
         "depth_sph_corr-test{:04d}.mat", n_test, "mat", True),
    ]
    for arch, sub, pat, n, kind, transposed in specs:
        path = os.path.join(base, arch)
        if os.path.exists(path):
            print(f"  {arch}: exists, skipping")
            continue
        t0 = time.perf_counter()
        with tarfile.open(path + ".part", "w:gz", compresslevel=1) as tf:
            for i in range(n):
                data = (_jpeg_bytes(rng) if kind == "jpg"
                        else _depth_mat_bytes(rng, transposed))
                _add_bytes(tf, f"{sub}/{pat.format(i)}", data)
        os.replace(path + ".part", path)
        mb = os.path.getsize(path) / 1e6
        print(f"  {arch}: {n} files, {mb:.0f} MB, "
              f"{time.perf_counter() - t0:.0f}s")


def synth_nyu(data_dir: str, n: int = 1449, seed: int = 12,
              frames_per_scene: int = 4) -> None:
    """Write a v7.3-shaped nyu_depth_v2_labeled.mat under <data_dir>/nyu/."""
    import h5py

    base = os.path.join(data_dir, "nyu")
    os.makedirs(base, exist_ok=True)
    path = os.path.join(base, "nyu_depth_v2_labeled.mat")
    if os.path.exists(path):
        print("  nyu_depth_v2_labeled.mat: exists, skipping")
        return
    rng = np.random.default_rng(seed)
    H, W = NYU_HW
    t0 = time.perf_counter()
    tmp = path + ".part"
    # MATLAB v7.3: 512-byte userblock, text header + version bytes, then
    # the HDF5 file proper (signature at offset 512).
    with h5py.File(tmp, "w", userblock_size=512) as f:
        imgs = f.create_dataset("images", shape=(n, 3, W, H),
                                dtype=np.uint8, chunks=(1, 3, W, H))
        deps = f.create_dataset("depths", shape=(n, W, H),
                                dtype=np.float32, chunks=(1, W, H))
        # One frame at a time: peak RAM stays ~one example, the write
        # pattern real converters use for the 2.8 GB original.
        for i in range(n):
            img_hw3 = _smooth_u8(rng, (H, W))           # (H, W, 3)
            imgs[i] = img_hw3.transpose(2, 1, 0)        # -> (3, W, H)
            d = _smooth_u8(rng, (H, W), channels=1)[..., 0]
            deps[i] = (0.7 + d.astype(np.float32) / 255.0 * 9.3).T  # (W, H)
        scene_names = [
            f"scene_{i // frames_per_scene:04d}" for i in range(n)]
        refs = []
        for k, s in enumerate(scene_names):
            ds = f.create_dataset(
                f"#refs#/s{k}",
                data=np.array([[ord(c)] for c in s], np.uint16))
            refs.append(ds.ref)
        f.create_dataset("scenes", data=np.array(refs, h5py.ref_dtype)[:, None])
    with open(tmp, "r+b") as f:
        hdr = (b"MATLAB 7.3 MAT-file, Platform: GLNXA64, Created by "
               b"ann3depth_tpu tools/synth_real_scale.py")
        f.write(hdr.ljust(116, b" "))
        f.seek(124)
        f.write(b"\x00\x02IM")  # version + endian indicator
    os.replace(tmp, path)
    print(f"  nyu_depth_v2_labeled.mat: {n} frames, "
          f"{os.path.getsize(path) / 1e9:.2f} GB, "
          f"{time.perf_counter() - t0:.0f}s")


def synth_nyu_splits(data_dir: str, n: int = 1449, seed: int = 13,
                     n_train: int = 795) -> None:
    """Write an official-style splits.mat (MATLAB v5: trainNdxs/testNdxs,
    1-based column vectors, the standard 795/654 partition) next to the
    labeled mat — exercises NYUDataset's tier-1 split resolution."""
    import scipy.io

    path = os.path.join(data_dir, "nyu", "splits.mat")
    if os.path.exists(path):
        print("  splits.mat: exists, skipping")
        return
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n) + 1  # 1-based, disjoint, covers all frames
    scipy.io.savemat(path, {
        "trainNdxs": np.sort(perm[:n_train]).reshape(-1, 1).astype(np.float64),
        "testNdxs": np.sort(perm[n_train:]).reshape(-1, 1).astype(np.float64),
    })
    print(f"  splits.mat: {n_train} train / {n - n_train} test indices")


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("data_dir")
    ap.add_argument("--nyu-n", type=int, default=1449)
    ap.add_argument("--make3d-n", type=int, default=400)
    ap.add_argument("--dataset", choices=["make3d", "nyu", "all"],
                    default="all")
    ap.add_argument("--splits", action="store_true",
                    help="also write the official-style NYU splits.mat "
                         "(tier-1 split resolution; omit to exercise the "
                         "scene-based tier-2 path)")
    args = ap.parse_args()
    if args.dataset in ("make3d", "all"):
        print("make3d archives:")
        synth_make3d(args.data_dir, n_train=args.make3d_n)
    if args.dataset in ("nyu", "all"):
        print("nyu labeled mat:")
        synth_nyu(args.data_dir, n=args.nyu_n)
        if args.splits:
            synth_nyu_splits(args.data_dir, n=args.nyu_n)
    free = shutil.disk_usage(args.data_dir).free / 1e9
    print(f"done; {free:.0f} GB free on the data volume")


if __name__ == "__main__":
    main()
