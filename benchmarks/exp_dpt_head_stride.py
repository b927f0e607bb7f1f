"""A/B: DPT head_stride 2 (default, 192² finest maps) vs 4 (head at 96²).

The fusion head is HBM-bandwidth-bound at 192² (exp_dpt_profile). The
head_stride=4 variant consumes the same 4 taps but never materializes
192² feature maps. Speed measured here; quality impact requires real-data
eval (knob is NOT default — models/dpt.py docstring).

Run: python -m benchmarks.exp_dpt_head_stride [batch]
"""

from __future__ import annotations

import json
import sys

from benchmarks.exp_dpt_upsample import measure


def main(batch=8):
    from ann3depth_tpu.models.dpt import DPTDepthNet

    results = {}
    for hs in (2, 4):
        model = DPTDepthNet(remat=False, head_stride=hs)
        ms, loss = measure(model, batch)
        results[f"hs{hs}_ms"] = round(ms, 3)
        results[f"hs{hs}_loss"] = round(loss, 5)
    results["speedup_pct"] = round(
        100 * (results["hs2_ms"] / results["hs4_ms"] - 1), 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
