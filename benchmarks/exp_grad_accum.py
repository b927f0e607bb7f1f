"""Price gradient accumulation on the real chip: throughput + peak HBM of
effective-batch-128 training at accum 1 / 2 / 8 (microbatch 128/64/16).

What the numbers decide (recorded in BASELINE.md):
- the throughput tax of the scan-of-microbatches step vs the plain
  full-batch step at the same effective batch (XLA tiles larger
  microbatches better, so accum should cost some img/s), and
- the peak-HBM saving that is the feature's reason to exist (activation
  memory of one microbatch instead of the full batch).

Run: python -m benchmarks.exp_grad_accum  (TPU; ~3 compiles)
"""

from __future__ import annotations

import dataclasses
import json

from ann3depth_tpu.config import get_config
from benchmarks import bench_train


def run():
    rows = []
    for accum in (1, 2, 8):
        cfg = get_config("make3d-encdec")
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, batch_size=128,
                                           grad_accum=accum))
        r = bench_train.run(cfg, steps=60)
        row = {"batch": 128, "grad_accum": accum,
               "microbatch": 128 // accum,
               "images_per_sec": r["images_per_sec"],
               "step_ms": r["step_ms"],
               "mfu_raw": r.get("mfu"),
               # None through the axon tunnel (memory_stats unavailable,
               # flops.attach_memory); populated on locally-attached chips
               "peak_hbm_gb": r.get("peak_hbm_gb")}
        rows.append(row)
        print(json.dumps(row), flush=True)
    # XLA's cost analysis counts a scan body ONCE (bench_infer.py learned
    # this first), so bench_train's mfu numerator misses (accum-1)/accum of
    # the real FLOPs when grad_accum>1. Effective FLOPs per step are
    # identical at fixed effective batch, so correct from the accum=1 row:
    # mfu_a = mfu_1 * (img/s)_a / (img/s)_1.
    base = rows[0]
    base["mfu"] = base["mfu_raw"]
    for row in rows[1:]:
        row["vs_accum1_pct"] = round(
            100 * (row["images_per_sec"] / base["images_per_sec"] - 1), 2)
        # mfu_raw is absent off-TPU (device_peak_flops None): skip the
        # correction instead of multiplying None
        row["mfu"] = (round(base["mfu_raw"] * row["images_per_sec"]
                            / base["images_per_sec"], 4)
                      if base["mfu_raw"] is not None else None)
    print(json.dumps({"exp": "grad_accum_b128", "rows": rows}))
    return rows


if __name__ == "__main__":
    run()
