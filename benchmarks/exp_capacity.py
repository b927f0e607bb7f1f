"""Price the capacity dial (ModelConfig.width_mult) on the synthetic
convergence protocol: eval RMSE + train throughput + parameter count per
width. width_mult has shipped since r1 but was never priced — a user
choosing between a cheaper or larger encdec had no measured tradeoff.

Same protocol as exp_convergence/exp_loss: identical data/steps/seed per
arm, loss-independent eval metrics on the held-out pool; throughput from
the scan-of-K train bench (dispatch-noise-free).

Run: python -m benchmarks.exp_capacity [steps] [w,w,...]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import numpy as np

from benchmarks.exp_convergence import (RESULTS, _device_pool,
                                        _eval_on_pool, _train_on_pool)


def study_capacity(steps=4000, batch=16, widths=(0.5, 1.0, 2.0),
                   record=True):
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.models.encdec import EncDecDepthNet
    from ann3depth_tpu.train import step as steplib
    from benchmarks import bench_train

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

    arms = {}
    for w in widths:
        model = EncDecDepthNet(width_mult=w)
        n_params = int(sum(
            np.prod(l.shape) for l in jax.tree.leaves(
                steplib.init_params(model, cfg.data.input_hw, seed=0))))
        print(f"training encdec width_mult={w} ({n_params} params) for "
              f"{steps} steps...", flush=True)
        state, curve = _train_on_pool(model, cfg, pool, steps, batch,
                                      emit_s2d=s2d)
        ev = _eval_on_pool(model.apply, state.params, cfg, pool_test,
                           batch, target_hw)
        bcfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, width_mult=w))
        thr = bench_train.run(bcfg, steps=60, warmup=10, record=False)
        arms[str(w)] = {
            "params": n_params,
            "final_train": curve[-1],
            "eval": ev,
            "train_images_per_sec": thr["images_per_sec"],
            "mfu": thr.get("mfu"),
        }
        print(json.dumps({w: arms[str(w)]}), flush=True)

    base = arms.get("1.0", {}).get("eval", {}).get("rmse")
    result = {
        "bench": "capacity_encdec",
        "steps": steps, "batch": batch,
        "backend": jax.default_backend(),
        "arms": arms,
        "time": time.time(),
    }
    if base:
        result["rmse_delta_vs_w1_pct"] = {
            k: round(100 * (v["eval"]["rmse"] / base - 1), 3)
            for k, v in arms.items()}
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    widths = (tuple(float(w) for w in sys.argv[2].split(","))
              if len(sys.argv) > 2 else (0.5, 1.0, 2.0))
    print(json.dumps(study_capacity(steps=steps, widths=widths)))
