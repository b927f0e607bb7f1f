"""Price EMA weights on trained weights: quality (eval RMSE, live vs
Polyak-averaged params after a synthetic-data convergence run) and
throughput (train step with/without the in-step EMA update).

Run: python -m benchmarks.exp_ema [steps] [decay]   (TPU)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")


def run(steps=4000, batch=16, decay=0.999, record=True):
    import jax

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.models.encdec import EncDecDepthNet
    from benchmarks import bench_train
    from benchmarks.exp_convergence import (_device_pool, _eval_on_pool,
                                            _train_on_pool)

    cfg = get_config("make3d-encdec")
    train_ds = SyntheticDepthDataset(n=512, img_hw=(360, 480),
                                     depth_hw=(180, 240), seed=0)
    test_ds = SyntheticDepthDataset(n=64, img_hw=(360, 480),
                                    depth_hw=(180, 240), seed=1)
    print(f"staging pools ({len(train_ds)} train / {len(test_ds)} test)...",
          flush=True)
    pool = _device_pool(train_ds)
    pool_test = _device_pool(test_ds)

    model = EncDecDepthNet()
    print(f"training encdec {steps} steps @ b{batch}, ema_decay={decay}...",
          flush=True)
    state, curve = _train_on_pool(model, cfg, pool, steps, batch,
                                  emit_s2d=EncDecDepthNet.S2D_INPUT_FACTOR,
                                  ema_decay=decay)

    target_hw = EncDecDepthNet.output_hw(cfg.data.input_hw)
    eval_live = _eval_on_pool(model.apply, state.params, cfg, pool_test,
                              batch, target_hw)
    eval_ema = _eval_on_pool(model.apply, state.ema_params, cfg, pool_test,
                             batch, target_hw)

    # throughput tax of the in-step EMA update (expected ~free: one fused
    # elementwise pass over 2M params vs ~0.13 TFLOP of convs)
    cfg_ema = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=decay))
    r_plain = bench_train.run(cfg, steps=60, record=False)
    r_ema = bench_train.run(cfg_ema, steps=60, record=False)

    result = {
        "bench": "ema_pricing",
        "steps": steps, "batch": batch, "decay": decay,
        "backend": jax.default_backend(),
        "loss_curve_tail": curve[-2:],
        "eval_live": eval_live,
        "eval_ema": eval_ema,
        "ema_rmse_delta_pct": round(
            100 * (eval_ema["rmse"] / eval_live["rmse"] - 1), 3),
        "train_img_per_sec_plain": r_plain["images_per_sec"],
        "train_img_per_sec_ema": r_ema["images_per_sec"],
        "ema_throughput_delta_pct": round(
            100 * (r_ema["images_per_sec"] / r_plain["images_per_sec"] - 1),
            2),
        "time": time.time(),
    }
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    decay = float(sys.argv[2]) if len(sys.argv) > 2 else 0.999
    run(steps=steps, decay=decay)
