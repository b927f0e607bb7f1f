"""Price the training-loss variants (r3: --loss si | l2 | berhu).

Same synthetic convergence protocol as exp_convergence: train an encdec
to plateau per loss (identical data/schedule/steps/seed), then score all
three checkpoints with the SAME loss-independent error metrics on the
held-out pool. Answers: does the reference's scale-invariant loss
actually win on final RMSE, and what do the variants trade?

Run: python -m benchmarks.exp_loss [steps] [kind,kind,...]
(the optional kind list re-runs a subset, e.g. after a loss-code fix,
without repaying the unaffected arms)
"""

from __future__ import annotations

import json
import sys
import time

import jax

from benchmarks.exp_convergence import (RESULTS, _device_pool,
                                        _eval_on_pool, _train_on_pool)


def study_losses(steps=4000, batch=16, record=True,
                 kinds=("si", "l2", "berhu")):
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
    for kind in kinds:
        model = EncDecDepthNet()
        print(f"training encdec with loss={kind} for {steps} steps...",
              flush=True)
        state, curve = _train_on_pool(model, cfg, pool, steps, batch,
                                      emit_s2d=s2d, loss_kind=kind)
        evals[kind] = {
            "final_train": curve[-1],
            "eval": _eval_on_pool(model.apply, state.params, cfg,
                                  pool_test, batch, target_hw),
        }

    rmse = {k: v["eval"]["rmse"] for k, v in evals.items()}
    result = {
        "bench": "loss_variants_encdec",
        "steps": steps, "batch": batch,
        "backend": jax.default_backend(),
        "evals": evals,
        "time": time.time(),
    }
    if "si" in rmse:
        base = rmse["si"]
        result["rmse_delta_vs_si_pct"] = {
            k: round(100 * (v / base - 1), 3) for k, v in rmse.items()}
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    kinds = (tuple(sys.argv[2].split(",")) if len(sys.argv) > 2
             else ("si", "l2", "berhu"))
    print(json.dumps(study_losses(steps=steps, kinds=kinds)))
