"""Price the fused augmentation pipeline [B:9] on trained weights:
train encdec on the 512-image synthetic pool with augmentation ON vs
OFF, evaluate both on the held-out split. With a small train pool the
flip/crop-zoom/photometric augmentation (all fused into the device
resample — ops/pallas_preprocess.py math) should buy generalization;
this measures how much, plus its step-time cost.

Run: python -m benchmarks.exp_augment [steps]   (TPU)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")


def run(steps=4000, batch=16, record=True):
    import jax

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.models.encdec import EncDecDepthNet
    from benchmarks.exp_convergence import (_device_pool, _eval_on_pool,
                                            _train_on_pool)

    train_ds = SyntheticDepthDataset(n=512, img_hw=(360, 480),
                                     depth_hw=(180, 240), seed=0)
    test_ds = SyntheticDepthDataset(n=64, img_hw=(360, 480),
                                    depth_hw=(180, 240), seed=1)
    print(f"staging pools ({len(train_ds)} train / {len(test_ds)} test)...",
          flush=True)
    pool = _device_pool(train_ds)
    pool_test = _device_pool(test_ds)
    target_hw = EncDecDepthNet.output_hw((240, 320))

    arms = {}
    for augment in (False, True):
        cfg = get_config("make3d-encdec")
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, augment=augment))
        model = EncDecDepthNet()
        print(f"training encdec {steps} steps @ b{batch}, "
              f"augment={augment}...", flush=True)
        t0 = time.perf_counter()
        state, curve = _train_on_pool(
            model, cfg, pool, steps, batch,
            emit_s2d=EncDecDepthNet.S2D_INPUT_FACTOR)
        wall = time.perf_counter() - t0
        ev = _eval_on_pool(model.apply, state.params, cfg, pool_test,
                           batch, target_hw)
        arms[augment] = {"eval": ev, "final_train": curve[-1],
                         "wall_s": round(wall, 1)}
        print(json.dumps({"augment": augment, **arms[augment]}), flush=True)

    off, on = arms[False], arms[True]
    result = {
        "bench": "augment_pricing",
        "steps": steps, "batch": batch,
        "backend": jax.default_backend(),
        "eval_no_aug": off["eval"],
        "eval_aug": on["eval"],
        "aug_rmse_delta_pct": round(
            100 * (on["eval"]["rmse"] / off["eval"]["rmse"] - 1), 3),
        "train_rmse_no_aug": off["final_train"]["rmse"],
        "train_rmse_aug": on["final_train"]["rmse"],
        "wall_s_no_aug": off["wall_s"],
        "wall_s_aug": on["wall_s"],
        "time": time.time(),
    }
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    run(steps=steps)
