"""Packed on-disk record shards (SURVEY §2.1 downloader row: "pre-convert
to paired arrays on disk"; §3.4).

Raw Make3D/NYU decode (JPEG + .mat per example) costs ~10s of ms of host CPU
per image — fine for one epoch, wasteful for many. `pack()` pre-converts any
dataset with the loader protocol into .npz shards of contiguous uint8
image / f32 depth arrays; `RecordDataset` then serves batches with zero
decode work (just memmap'd slicing), keeping the host side of the input
pipeline far below the device step time.

Shard layout: <out_dir>/<name>-<split>-NNNNN.npz with arrays
  images: uint8 [n, H, W, 3]      depths: float32 [n, dh, dw]
plus <name>-<split>-index.json recording shard sizes and shapes.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Tuple

import numpy as np


def pack(dataset, out_dir: str, split: str, shard_size: int = 64) -> str:
    """Pre-convert `dataset` (loader protocol) into packed npz shards."""
    os.makedirs(out_dir, exist_ok=True)
    name = getattr(dataset, "name", "dataset")
    shards = []
    n = len(dataset)
    if n == 0:
        raise ValueError(
            f"cannot pack empty dataset {name!r} (split={split!r})")
    for s0 in range(0, n, shard_size):
        idx = range(s0, min(s0 + shard_size, n))
        imgs, deps = zip(*(dataset[i] for i in idx))
        imgs, deps = np.stack(imgs), np.stack(deps)
        path = os.path.join(out_dir, f"{name}-{split}-{s0 // shard_size:05d}.npz")
        np.savez(path, images=imgs, depths=deps)
        shards.append({"path": os.path.basename(path), "n": int(imgs.shape[0])})
    index = {
        "name": name, "split": split, "total": n,
        "image_shape": list(imgs.shape[1:]), "depth_shape": list(deps.shape[1:]),
        "shards": shards,
    }
    index_path = os.path.join(out_dir, f"{name}-{split}-index.json")
    with open(index_path, "w") as f:
        json.dump(index, f, indent=1)
    return index_path


class RecordDataset:
    """Serve batches from packed shards; loader-protocol compatible."""

    def __init__(self, index_path: str):
        with open(index_path) as f:
            self.index = json.load(f)
        self.name = self.index["name"]
        base = os.path.dirname(index_path)
        self._shards = [os.path.join(base, s["path"]) for s in self.index["shards"]]
        self._sizes = [s["n"] for s in self.index["shards"]]
        self._offsets = np.cumsum([0] + self._sizes)
        self._cache = {}

    def __len__(self):
        return self.index["total"]

    def _shard(self, si):
        if si not in self._cache:
            if len(self._cache) > 2:  # keep at most 3 shards resident
                self._cache.pop(next(iter(self._cache)))
            with np.load(self._shards[si]) as z:
                self._cache[si] = (z["images"], z["depths"])
        return self._cache[si]

    def __getitem__(self, i) -> Tuple[np.ndarray, np.ndarray]:
        si = int(np.searchsorted(self._offsets, i, side="right") - 1)
        imgs, deps = self._shard(si)
        j = i - self._offsets[si]
        return imgs[j], deps[j]

    def batches(self, batch_size, *, steps=None, shuffle=True, seed=0,
                drop_remainder=True):
        """Yield stacked raw batches via the shared epoch iterator
        (data/batching.py — one implementation, shared semantics)."""
        from ann3depth_tpu.data.batching import iter_batches

        return iter_batches(self, batch_size, steps=steps, shuffle=shuffle,
                            seed=seed, drop_remainder=drop_remainder)


def find_index(out_dir: str, name: str, split: str):
    matches = glob.glob(os.path.join(out_dir, f"{name}-{split}-index.json"))
    return matches[0] if matches else None
