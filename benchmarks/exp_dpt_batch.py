"""DPT-384 train batch sweep: does the encdec b128 tiling effect
(docs/design.md §2c) have a DPT analogue?

b8 remat=False is the measured default (584 img/s). Larger batches need
remat for HBM headroom; this measures both axes.

Run: python -m benchmarks.exp_dpt_batch [batches...]   (default: 8 16)
"""

from __future__ import annotations

import dataclasses
import json
import sys

from benchmarks import bench_train


def main(batches=(8, 16)):
    from ann3depth_tpu.config import get_config

    out = []
    for b in batches:
        # Try both remat settings at every batch; an OOM at large
        # batch/no-remat is itself a data point (caught below).
        for remat in (False, True):
            cfg = get_config("dpt-384")
            cfg = dataclasses.replace(
                cfg,
                model=dataclasses.replace(cfg.model, remat=remat),
                train=dataclasses.replace(cfg.train, batch_size=b))
            try:
                r = bench_train.run(cfg, steps=30, record=True)
            except Exception as e:  # OOM at large batch is a data point
                out.append({"batch": b, "remat": remat,
                            "error": type(e).__name__})
                continue
            out.append({"batch": b, "remat": remat,
                        "images_per_sec": r["images_per_sec"],
                        "mfu": r.get("mfu")})
            print(json.dumps(out[-1]), flush=True)
    print(json.dumps({"bench": "dpt_batch_sweep", "rows": out}))


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or (8, 16))
