"""Price the quality levers on DPT-384 trained weights (VERDICT r3 item 5).

Every quality lever in BASELINE.md (si+grad loss, fused augmentation, flip
TTA) was priced on encdec convergence runs only; DPT had thorough PERF
pricing (batch ladder, int8/fused-QKV/head-stride rejections) but no
quality numbers. This reuses the exact r3 DPT convergence protocol
(exp_convergence.study_dpt: synthetic pools, 2500 steps, b8, seed 0 — the
si arm retrains the r3 baseline deterministically) and trains the 2x2 grid
{si, si+grad} x {augment off, on}, evaluating each arm with and without
flip TTA.

Run: python -m benchmarks.exp_dpt_levers [steps]
"""

from __future__ import annotations

import json
import sys
import time

import jax

from benchmarks.exp_convergence import (RESULTS, _device_pool,
                                        _eval_on_pool, _train_on_pool)


def study_dpt_levers(steps=2500, batch=8, record=True):
    import dataclasses

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.models.dpt import DPTDepthNet

    cfg0 = get_config("dpt-384")
    train_ds = SyntheticDepthDataset(n=256, img_hw=(420, 560),
                                     depth_hw=(210, 280), seed=0)
    test_ds = SyntheticDepthDataset(n=64, img_hw=(420, 560),
                                    depth_hw=(210, 280), seed=1)
    print(f"staging pools to device ({len(train_ds)} train / "
          f"{len(test_ds)} test)...", flush=True)
    pool = _device_pool(train_ds)
    pool_test = _device_pool(test_ds)

    model = DPTDepthNet(remat=False)  # measured default (config.py)
    target_hw = DPTDepthNet.output_hw(cfg0.data.input_hw)

    arms = {}
    for loss_kind in ("si", "si+grad"):
        for augment in (False, True):
            key = f"{loss_kind}{'+aug' if augment else ''}"
            cfg = dataclasses.replace(
                cfg0, data=dataclasses.replace(cfg0.data, augment=augment))
            print(f"training dpt-384 arm {key} for {steps} steps @ "
                  f"b{batch}...", flush=True)
            state, curve = _train_on_pool(model, cfg, pool, steps, batch,
                                          emit_s2d=0, loss_kind=loss_kind)
            ev = _eval_on_pool(model.apply, state.params, cfg, pool_test,
                               batch, target_hw)
            ev_tta = _eval_on_pool(model.apply, state.params, cfg,
                                   pool_test, batch, target_hw, tta="flip")
            arms[key] = {"final_train": curve[-1], "eval": ev,
                         "eval_tta": ev_tta}
            print(json.dumps({key: arms[key]}), flush=True)

    base = arms["si"]["eval"]["rmse"]
    result = {
        "bench": "dpt_levers",
        "steps": steps, "batch": batch,
        "backend": jax.default_backend(),
        "arms": arms,
        "rmse_delta_vs_si_pct": {
            k: {"plain": round(100 * (v["eval"]["rmse"] / base - 1), 2),
                "tta": round(100 * (v["eval_tta"]["rmse"] / base - 1), 2)}
            for k, v in arms.items()},
        "time": time.time(),
    }
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    print(json.dumps(study_dpt_levers(steps=steps)))
