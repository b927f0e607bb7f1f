"""Optional grain-backed input pipeline (SURVEY §7.2 M2: "grain-based
shuffling/batching").

Wraps any dataset with the loader protocol (data/make3d.py etc.) into a
`grain.MapDataset` pipeline: deterministic global shuffle per epoch,
worker-parallel decode, batching — then hands batches to the same
DeviceFeed. On this 1-core host the built-in `batches()` iterators are just
as fast, so grain is opt-in: set `DataConfig.use_grain` (CLI `--use-grain`
/ `--num-workers N`) and train/loop.py routes the host pipeline through
`grain_batches`. On real multi-core TPU hosts grain's worker pool is the
right tool for JPEG/mat decode throughput.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


def grain_batches(dataset, batch_size: int, *, steps: Optional[int] = None,
                  shuffle: bool = True, seed: int = 0,
                  num_workers: int = 0) -> Iterator:
    """Yield (img_u8 [B,...], depth [B,...]) batches via grain.

    dataset: anything with __len__/__getitem__ returning (img, depth).
    steps: stop after N batches (repeats epochs, reshuffled); None = 1 epoch.
    """
    import grain.python as grain

    source = _LoaderSource(dataset)
    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shard_options=grain.NoSharding(),
        shuffle=shuffle,
        num_epochs=None if steps is not None else 1,
        seed=seed,
    )
    loader = grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[grain.Batch(batch_size, drop_remainder=True)],
        worker_count=num_workers,
    )
    n = 0
    for batch in loader:
        yield batch["image"], batch["depth"]
        n += 1
        if steps is not None and n >= steps:
            return


class _LoaderSource:
    """grain RandomAccessDataSource view of a loader-protocol dataset."""

    def __init__(self, dataset):
        self._ds = dataset

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, i):
        img, depth = self._ds[int(i)]
        return {"image": img, "depth": depth}


