"""Price quantization-aware training (r3: model.quant="int8-qat").

Question: post-training int8 quantization of a bf16-trained encdec costs
+0.68% eval RMSE (benchmarks/exp_convergence.py, BASELINE.md). Does QAT —
training the fake-quant simulation with STE gradients (ops/quant.qconv_fake)
— recover that gap, and what does it cost per step?

Protocol (same synthetic convergence regime as exp_convergence):
  1. train a bf16 encdec and an int8-qat encdec to plateau on the same
     HBM-staged pool (same seed/steps/batch/schedule);
  2. eval each on the held-out pool: bf16 params served bf16 AND int8
     (the PTQ gap), QAT params served int8 (the QAT claim) AND via the
     fake-quant graph (divergence check: train forward == serve forward);
  3. report RMSE deltas + wall-clock ratio of the two training runs.

Run: python -m benchmarks.exp_qat [steps]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

from benchmarks.exp_convergence import (RESULTS, _device_pool,
                                        _eval_on_pool, _train_on_pool)


def study_qat(steps=4000, batch=16, record=True):
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

    runs = {}
    for tag, model in (("bf16", EncDecDepthNet()),
                       ("qat", EncDecDepthNet(quant="int8-qat"))):
        print(f"training {tag} encdec for {steps} steps @ b{batch}...",
              flush=True)
        t0 = time.perf_counter()
        state, curve = _train_on_pool(model, cfg, pool, steps, batch,
                                      emit_s2d=s2d)
        runs[tag] = {"params": state.params, "curve": curve,
                     "train_s": round(time.perf_counter() - t0, 1)}

    serve_bf16 = EncDecDepthNet()
    serve_int8 = EncDecDepthNet(quant="int8")
    serve_qat = EncDecDepthNet(quant="int8-qat")

    evals = {
        # the PTQ gap (reproduces exp_convergence's finding)
        "bf16_served_bf16": _eval_on_pool(serve_bf16.apply,
                                          runs["bf16"]["params"], cfg,
                                          pool_test, batch, target_hw),
        "bf16_served_int8": _eval_on_pool(serve_int8.apply,
                                          runs["bf16"]["params"], cfg,
                                          pool_test, batch, target_hw),
        # the QAT claim: int8 serving of QAT-trained params
        "qat_served_int8": _eval_on_pool(serve_int8.apply,
                                         runs["qat"]["params"], cfg,
                                         pool_test, batch, target_hw),
        # train-forward == serve-forward check
        "qat_served_fakequant": _eval_on_pool(serve_qat.apply,
                                              runs["qat"]["params"], cfg,
                                              pool_test, batch, target_hw),
    }

    rmse = {k: v["rmse"] for k, v in evals.items()}
    result = {
        "bench": "qat_encdec",
        "steps": steps, "batch": batch,
        "backend": jax.default_backend(),
        # Whole-run wall clock INCLUDING compile + staging + tunnel
        # variance — NOT a step-cost measurement (the first recorded run
        # showed -51% from a slow-tunnel window on the bf16 leg). For the
        # real training cost use the scan-of-K bench:
        #   python -m ann3depth_tpu bench --config make3d-encdec \
        #       [--quant int8-qat]
        # (measured +38.9% step time, BASELINE.md).
        "train_wall_s_bf16_incl_compile": runs["bf16"]["train_s"],
        "train_wall_s_qat_incl_compile": runs["qat"]["train_s"],
        "loss_curve_bf16": runs["bf16"]["curve"][-3:],
        "loss_curve_qat": runs["qat"]["curve"][-3:],
        "evals": evals,
        # PTQ gap on this run (bf16 weights served int8 vs bf16)
        "ptq_rmse_delta_pct": round(
            100 * (rmse["bf16_served_int8"] / rmse["bf16_served_bf16"] - 1),
            3),
        # QAT int8 serving vs the bf16 baseline — the headline number
        "qat_int8_rmse_delta_pct": round(
            100 * (rmse["qat_served_int8"] / rmse["bf16_served_bf16"] - 1),
            3),
        # serve/train forward agreement for the QAT checkpoint
        "qat_serve_vs_train_rmse_delta_pct": round(
            100 * (rmse["qat_served_int8"] / rmse["qat_served_fakequant"]
                   - 1), 3),
        "time": time.time(),
    }
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    print(json.dumps(study_qat(steps=steps)))
