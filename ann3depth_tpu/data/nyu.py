"""NYU Depth v2 loader (SURVEY §2.1 "NYU loader", [B:9]).

Reads the labeled subset `nyu_depth_v2_labeled.mat` — a MATLAB v7.3 (HDF5)
file with datasets `images` (N,3,W,H uint8) and `depths` (N,W,H f32 meters)
— via h5py, lazily per index so the 2.8 GB file is never materialized.

Canonical orientation: HDF5 stores W-major; we transpose to [H=480, W=640].
Split convention: the standard ~795/654 train/test split is index-based;
without the official split .mat we use the conventional every-other-scene
approximation: even indices train, odd test (documented, deterministic).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

MAT_NAME = "nyu_depth_v2_labeled.mat"


class NYUDataset:
    name = "nyu"

    def __init__(self, data_dir: str, split: str = "train", path: str = None):
        self.path = path or os.path.join(data_dir, "nyu", MAT_NAME)
        if not os.path.exists(self.path):
            raise FileNotFoundError(
                f"{self.path} not found; run `python -m ann3depth_tpu "
                f"download --dataset nyu` or stage the file manually")
        import h5py

        self._f = h5py.File(self.path, "r")
        n = self._f["images"].shape[0]
        idx = np.arange(n)
        if split == "train":
            self.indices = idx[idx % 2 == 0]
        elif split == "test":
            self.indices = idx[idx % 2 == 1]
        else:
            raise ValueError(f"split must be train|test, got {split!r}")

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i) -> Tuple[np.ndarray, np.ndarray]:
        j = int(self.indices[i])
        # images: (N, 3, W, H) -> (H, W, 3); depths: (N, W, H) -> (H, W)
        img = np.asarray(self._f["images"][j]).transpose(2, 1, 0)
        depth = np.asarray(self._f["depths"][j]).T.astype(np.float32)
        return np.ascontiguousarray(img, dtype=np.uint8), depth

    def batches(self, batch_size, *, steps=None, shuffle=True, seed=0,
                drop_remainder=True):
        """Yield stacked raw batches via the shared epoch iterator
        (data/batching.py — one implementation, shared semantics)."""
        from ann3depth_tpu.data.batching import iter_batches

        return iter_batches(self, batch_size, steps=steps, shuffle=shuffle,
                            seed=seed, drop_remainder=drop_remainder)

    def close(self):
        self._f.close()
