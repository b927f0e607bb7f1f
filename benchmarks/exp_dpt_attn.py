"""A/B: DPT inner attention — flax einsum SDPA vs jax.nn.dot_product_attention.

Same parameters, same math (no mask/bias/dropout at 576 tokens); jnn is
the XLA-fused SDPA entry point. scan-of-K on the real TPU.

Run: python -m benchmarks.exp_dpt_attn [batch]
"""

from __future__ import annotations

import json
import sys

from benchmarks.exp_dpt_upsample import measure


def main(batch=8):
    from ann3depth_tpu.models.dpt import DPTDepthNet

    results = {}
    for name in ("flax", "jnn"):
        model = DPTDepthNet(remat=False, attention_impl=name)
        ms, loss = measure(model, batch)
        results[f"{name}_ms"] = round(ms, 3)
        results[f"{name}_loss"] = round(loss, 5)
    results["speedup_pct"] = round(
        100 * (results["flax_ms"] / results["jnn_ms"] - 1), 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
