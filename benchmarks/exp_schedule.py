"""Price the learning-rate schedule choice (--schedule cosine | constant)
on the synthetic convergence protocol.

The reference's TF1-era regime was a flat learning rate; the rebuild
defaults to warmup+cosine. Both arms train the same encdec on identical
data/steps/seed and are scored with loss-independent eval metrics — the
measured answer to "does the modern schedule actually matter here".

Run: python -m benchmarks.exp_schedule [steps]
"""

from __future__ import annotations

import json
import sys
import time

import jax

from benchmarks.exp_convergence import (RESULTS, _device_pool,
                                        _eval_on_pool, _train_on_pool)


def study_schedules(steps=4000, batch=16, record=True):
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.models.encdec import EncDecDepthNet

    cfg = get_config("make3d-encdec")
    train_ds = SyntheticDepthDataset(n=512, img_hw=(360, 480),
                                     depth_hw=(180, 240), seed=0)
    test_ds = SyntheticDepthDataset(n=64, img_hw=(360, 480),
                                    depth_hw=(180, 240), seed=1)
    print(f"staging pools to device ({len(train_ds)} train / "
          f"{len(test_ds)} test)...", flush=True)
    pool = _device_pool(train_ds)
    pool_test = _device_pool(test_ds)
    target_hw = EncDecDepthNet.output_hw(cfg.data.input_hw)
    s2d = EncDecDepthNet.S2D_INPUT_FACTOR

    evals = {}
    for sched in ("cosine", "constant"):
        model = EncDecDepthNet()
        print(f"training encdec with schedule={sched} for {steps} steps...",
              flush=True)
        state, curve = _train_on_pool(model, cfg, pool, steps, batch,
                                      emit_s2d=s2d, schedule=sched)
        evals[sched] = {
            "final_train": curve[-1],
            "eval": _eval_on_pool(model.apply, state.params, cfg,
                                  pool_test, batch, target_hw),
        }

    base = evals["cosine"]["eval"]["rmse"]
    result = {
        "bench": "schedule_encdec",
        "steps": steps, "batch": batch,
        "backend": jax.default_backend(),
        "evals": evals,
        "rmse_delta_vs_cosine_pct": {
            k: round(100 * (v["eval"]["rmse"] / base - 1), 3)
            for k, v in evals.items()},
        "time": time.time(),
    }
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    print(json.dumps(study_schedules(steps=steps)))
