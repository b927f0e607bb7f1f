"""Price flip test-time augmentation on trained weights (--tta flip).

TTA is the classic depth-eval ensemble: average the prediction with the
un-flipped prediction of the mirrored input (train/step.apply_with_tta).
Quality question: what does the second forward pass buy on a converged
model? Protocol = the synthetic convergence study (exp_convergence):
train encdec to plateau, then eval the held-out pool with tta off/on.
Also times the eval step both ways (the cost side: ~2x forward FLOPs).

Run: python -m benchmarks.exp_tta [steps] [batch]   (default 4000 16)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def run(steps=4000, batch=16, record=True):
    import jax

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.models.encdec import EncDecDepthNet
    from ann3depth_tpu.train import step as steplib
    from benchmarks.exp_convergence import (RESULTS, _device_pool,
                                            _eval_on_pool, _train_on_pool)

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
    print(f"training encdec for {steps} steps @ b{batch}...", flush=True)
    state, curve = _train_on_pool(model, cfg, pool, steps, batch,
                                  emit_s2d=EncDecDepthNet.S2D_INPUT_FACTOR)

    target_hw = EncDecDepthNet.output_hw(cfg.data.input_hw)
    eval_plain = _eval_on_pool(model.apply, state.params, cfg, pool_test,
                               batch, target_hw)
    eval_tta = _eval_on_pool(model.apply, state.params, cfg, pool_test,
                             batch, target_hw, tta="flip")

    # Eval-step cost both ways (device_get sync; amortized over the pool).
    def timed_eval(tta):
        t0 = time.perf_counter()
        _eval_on_pool(model.apply, state.params, cfg, pool_test, batch,
                      target_hw, tta=tta)
        return time.perf_counter() - t0

    timed_eval("")  # warm both programs
    timed_eval("flip")
    t_plain = timed_eval("")
    t_tta = timed_eval("flip")

    result = {
        "bench": "tta_encdec", "steps": steps, "batch": batch,
        "backend": jax.default_backend(),
        "final_train": curve[-1],
        "eval_plain": eval_plain,
        "eval_tta": eval_tta,
        "tta_rmse_delta_pct": round(
            100 * (eval_tta["rmse"] / eval_plain["rmse"] - 1), 3),
        "tta_absrel_delta_pct": round(
            100 * (eval_tta["abs_rel"] / eval_plain["abs_rel"] - 1), 3),
        "eval_s_plain": round(t_plain, 3),
        "eval_s_tta": round(t_tta, 3),
        "tta_eval_cost_pct": round(100 * (t_tta / t_plain - 1), 1),
        "time": time.time(),
    }
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("final_train",)}, indent=1))
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    run(*args)
