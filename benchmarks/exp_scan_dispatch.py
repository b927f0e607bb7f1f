"""K-dispatch ladder: sustained LOOP-LEVEL train rate vs steps_per_dispatch.

The scan-of-K benches (bench_train.py) isolate pure device throughput;
this experiment measures what a USER's `train --cache-device
--steps-per-dispatch K` run actually sustains through the real loop —
including the per-block index upload, dispatch, and the device_get sync
at each log boundary. Expected shape: rate(K) -> bench rate as the fixed
per-block cost amortizes ~1/K.

Protocol: one loop.train call per rung on the same synthetic pool
(real CLI composition, log cadence = K so every block is timed), then
read the per-block images_per_sec rows the loop itself wrote to
metrics.jsonl and take the median of the steady-state tail (drops the
first row, which contains compile + pool staging).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import tempfile
import time

RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")


def run_rung(k: int, steps: int, batch_size: int = 16) -> dict:
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    tmp = tempfile.mkdtemp(prefix=f"spd{k}-")
    try:
        cfg = get_config("make3d-encdec")
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(cfg.data, datasets=("synthetic",),
                                     cache_device=True),
            train=dataclasses.replace(
                cfg.train, steps=steps, batch_size=batch_size,
                steps_per_dispatch=k, log_every=max(k, 50),
                checkpoint_every=steps, eval_every=0, seed=11,
                ckpt_dir=os.path.join(tmp, "c")))
        looplib.train(cfg, workdir=tmp, progress=False)
        rows = [json.loads(l) for l in
                open(os.path.join(tmp, "metrics.jsonl"))]
        ips = [r["images_per_sec"] for r in rows if "images_per_sec" in r]
        tail = ips[1:] or ips  # drop the compile/staging row
        tail.sort()
        return {
            "k": k,
            "images_per_sec_median": round(tail[len(tail) // 2], 1),
            "images_per_sec_best": round(tail[-1], 1),
            "n_blocks_timed": len(tail),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run(record: bool = True) -> dict:
    import jax

    rungs = [run_rung(1, 600), run_rung(10, 600), run_rung(50, 600),
             run_rung(200, 1200)]
    result = {
        "bench": "scan_dispatch_ladder",
        "backend": jax.default_backend(),
        "batch": 16,
        "rungs": rungs,
        "time": time.time(),
    }
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    print(json.dumps(run(), indent=1))
