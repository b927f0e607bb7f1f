"""Measure the `encdec-w2-best` preset's composition (VERDICT r3 item 6).

BASELINE.md prices each quality lever independently on the synthetic
convergence protocol (seeded, deterministic — the si+grad arm retrained
bitwise-identically across r3 scripts): width-2 capacity -4.2% eval RMSE,
fused augmentation -1.2% (on w1), si+grad loss -1.74%, flip TTA -4.3%
(eval-only). The preset stacks them; this script trains the ACTUAL stack
(w2 x augment x si+grad at the preset's b64) once and evals plain + tta,
so the preset ships with a measured number, not an extrapolation of
independent deltas.

Run: python -m benchmarks.exp_w2_best [steps]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

from benchmarks.exp_convergence import (RESULTS, _device_pool,
                                        _eval_on_pool, _train_on_pool)

# Recorded r3 single-lever eval RMSEs on this exact protocol (BASELINE.md /
# results.jsonl), for the delta table the preset docs cite.
R3_SI_BASELINE_RMSE = 3.310    # w1, si, no augment (loss_variants_encdec)
R3_W2_RMSE = 3.171             # w2, si, no augment (capacity_encdec)


def study_w2_best(steps=4000, record=True):
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.models.encdec import EncDecDepthNet
    from ann3depth_tpu.train import step as steplib
    from benchmarks import bench_train

    cfg = get_config("encdec-w2-best")
    batch = cfg.train.batch_size
    # Same pools as every convergence study (seed-pinned).
    train_ds = SyntheticDepthDataset(n=512, img_hw=(360, 480),
                                     depth_hw=(180, 240), seed=0)
    test_ds = SyntheticDepthDataset(n=64, img_hw=(360, 480),
                                    depth_hw=(180, 240), seed=1)
    print(f"staging pools to device ({len(train_ds)} train / "
          f"{len(test_ds)} test)...", flush=True)
    pool = _device_pool(train_ds)
    pool_test = _device_pool(test_ds)

    model = EncDecDepthNet(width_mult=cfg.model.width_mult)
    n_params = int(sum(
        np.prod(l.shape) for l in jax.tree.leaves(
            steplib.init_params(model, cfg.data.input_hw, seed=0))))
    print(f"training encdec-w2-best stack ({n_params} params, b{batch}, "
          f"augment={cfg.data.augment}, loss={cfg.train.loss}) for "
          f"{steps} steps...", flush=True)
    state, curve = _train_on_pool(model, cfg, pool, steps, batch,
                                  emit_s2d=EncDecDepthNet.S2D_INPUT_FACTOR,
                                  loss_kind=cfg.train.loss)

    target_hw = EncDecDepthNet.output_hw(cfg.data.input_hw)
    ev = _eval_on_pool(model.apply, state.params, cfg, pool_test, 16,
                       target_hw)
    ev_tta = _eval_on_pool(model.apply, state.params, cfg, pool_test, 16,
                           target_hw, tta="flip")
    thr = bench_train.run(cfg, steps=60, warmup=10, record=False)

    result = {
        "bench": "w2_best_preset",
        "steps": steps, "batch": batch, "params": n_params,
        "backend": jax.default_backend(),
        "final_train": curve[-1],
        "eval": ev,
        "eval_tta": ev_tta,
        "train_images_per_sec": thr["images_per_sec"],
        "mfu": thr.get("mfu"),
        "rmse_delta_vs_r3_si_baseline_pct": round(
            100 * (ev["rmse"] / R3_SI_BASELINE_RMSE - 1), 2),
        "rmse_tta_delta_vs_r3_si_baseline_pct": round(
            100 * (ev_tta["rmse"] / R3_SI_BASELINE_RMSE - 1), 2),
        "rmse_delta_vs_r3_w2_pct": round(
            100 * (ev["rmse"] / R3_W2_RMSE - 1), 2),
        "time": time.time(),
    }
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    print(json.dumps(study_w2_best(steps=steps)))
