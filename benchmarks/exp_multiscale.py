"""Price the multi-scale coarse+fine model (models/multiscale.py) against
encdec on the standard synthetic convergence protocol.

Protocol: identical to exp_convergence's encdec study (512-image synthetic
pool, 4000 steps b16, seed 0, held-out 64-image eval) so the resulting
eval metrics are directly comparable to the recorded encdec rows
(results.jsonl convergence_encdec: eval RMSE 3.310 m; the quality-lever
ladders in BASELINE.md). Evals plain and with flip TTA.

Also measures train/serving throughput at the same b16 parity point via
bench_train (scan-of-K, device pipeline) for the BASELINE.md row.

Run: python benchmarks/exp_multiscale.py [steps]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")


def run(steps=4000, batch=16, record=True):
    import jax

    import bench_train
    from exp_convergence import _device_pool, _eval_on_pool, _train_on_pool
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.models.multiscale import MultiScaleDepthNet

    cfg = get_config("make3d-multiscale")
    train_ds = SyntheticDepthDataset(n=512, img_hw=(360, 480),
                                     depth_hw=(180, 240), seed=0)
    test_ds = SyntheticDepthDataset(n=64, img_hw=(360, 480),
                                    depth_hw=(180, 240), seed=1)
    print(f"staging pools ({len(train_ds)} train / {len(test_ds)} test)...",
          flush=True)
    pool = _device_pool(train_ds)
    pool_test = _device_pool(test_ds)

    model = MultiScaleDepthNet()
    print(f"training multiscale for {steps} steps @ b{batch}...", flush=True)
    state, curve = _train_on_pool(
        model, cfg, pool, steps, batch,
        emit_s2d=MultiScaleDepthNet.S2D_INPUT_FACTOR)

    target_hw = MultiScaleDepthNet.output_hw(cfg.data.input_hw)
    evals = {}
    for tta in ("", "flip"):
        em = _eval_on_pool(model.apply, state.params, cfg, pool_test,
                           batch, target_hw, tta=tta)
        evals["eval_tta" if tta else "eval"] = em
        print(json.dumps({"arm": f"multiscale tta={tta or 'off'}", **em}),
              flush=True)

    print("throughput (scan-of-K device pipeline, b16)...", flush=True)
    bt = bench_train.run(cfg, steps=100, warmup=10, raw_hw=(480, 640),
                         record=False)

    rec = {
        "benchmark": "multiscale_convergence",
        "steps": steps,
        "batch": batch,
        "backend": jax.default_backend(),
        "final_train_loss": curve[-1]["loss"],
        "curve": curve[-3:],
        **{f"{k}_{m}": v for k, em in evals.items()
           for m, v in em.items()},
        "train_images_per_sec": bt["images_per_sec"],
        "train_mfu": bt.get("mfu"),
        "comparison": "encdec same protocol: eval RMSE 3.310 "
                      "(results.jsonl convergence_encdec, r3)",
    }
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["steps"] = int(sys.argv[1])
    run(**kw)
