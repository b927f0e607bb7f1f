"""A/B: DPT q/k/v projections — three [E,E] matmuls (flax MHA) vs one
fused [E,3E] matmul (models/dpt.FusedQKVSelfAttention, param-compatible).

At E=384 each separate projection is a 3x3-tile matmul on the 128x128
MXU; fusing widens N to 9 tiles per launch. Measured both as the train
step (dpt-384 preset shapes) and the full serving program.

Run: python -m benchmarks.exp_dpt_qkv [batch]
"""

from __future__ import annotations

import json
import sys

from benchmarks.exp_dpt_upsample import measure


def main(batch=16):
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.models.dpt import DPTDepthNet
    from benchmarks import bench_infer

    cfg = get_config("dpt-384")
    results = {"batch": batch}
    for name in ("flax", "fused"):
        model = DPTDepthNet(remat=False, attention_impl=name)
        ms, loss = measure(model, batch)
        results[f"train_{name}_ms"] = round(ms, 3)
        results[f"train_{name}_loss"] = round(loss, 5)
        serve = bench_infer.run(cfg, batch=batch, record=False, model=model,
                                tag=f"dpt_qkv_{name}")
        results[f"serve_{name}_img_s"] = serve["images_per_sec"]
    results["train_speedup_pct"] = round(
        100 * (results["train_flax_ms"] / results["train_fused_ms"] - 1), 2)
    results["serve_speedup_pct"] = round(
        100 * (results["serve_fused_img_s"] / results["serve_flax_img_s"] - 1),
        2)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
