"""Performance regression gate (SURVEY §4.7): assert current numbers
against recorded floors on real TPU hardware.

Run on a TPU host:  python -m benchmarks.check_regression
(exit code 1 on regression; also appended to results.jsonl).

Floors are deliberately ~25% below the round-1 measured values in
BASELINE.md so environment noise doesn't flake the gate, while real
regressions (a de-fused step, a lost layout) trip it.
"""

from __future__ import annotations

import json
import sys

# floor, measured reference (BASELINE.md; r2 scan-of-K measurements —
# robust to the tunnel's per-dispatch RTT weather, see bench_train.py)
FLOORS = {
    # r4 measured 9331-9366 at bench.py's 400-step region; this gate's
    # own 60-step run amortizes the end sync less, so the floor stays
    # keyed to the 100-step-era 8215 reference.
    "encdec_b16_images_per_sec": (6000.0, 8215.0),
    # r3: preset moved to b16 remat=False (622 img/s, the sweep winner)
    "dpt384_train_images_per_sec": (500.0, 622.0),
    "live_device_step_ms_max": (5.0, 1.55),  # upper bound
    # Efficiency floor (VERDICT r1): catches "still fast in img/s but
    # regressed in MFU" after model-capacity changes. r2b measured 0.330
    # at b16 via XLA cost_analysis (benchmarks/flops.py).
    "encdec_b16_mfu": (0.20, 0.330),
    # Serving path (bench_infer, r2b: 16.7k bf16 / 18.6k int8 at b32).
    "encdec_b32_infer_images_per_sec": (13000.0, 16664.0),
    # DPT serving at its measured-optimal batch (r3: 2043 img/s, MFU 0.52
    # at b16 — BASELINE.md).
    "dpt384_b16_infer_images_per_sec": (1600.0, 2043.0),
}


def main() -> int:
    import jax

    if jax.default_backend() != "tpu":
        print(json.dumps({"skipped": "perf gate requires a TPU backend",
                          "backend": jax.default_backend()}))
        return 0

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.live.infer import LiveEngine
    from ann3depth_tpu.train import loop as looplib
    from benchmarks import bench_train

    results, failures = {}, []

    r = bench_train.run(get_config("make3d-encdec"), steps=60, record=False)
    results["encdec_b16_images_per_sec"] = r["images_per_sec"]
    results["encdec_b16_mfu"] = r.get("mfu", 0.0)

    r = bench_train.run(get_config("dpt-384"), steps=30, record=False)
    results["dpt384_train_images_per_sec"] = r["images_per_sec"]

    from benchmarks import bench_infer
    r = bench_infer.run(get_config("make3d-encdec"), batch=32, record=False)
    results["encdec_b32_infer_images_per_sec"] = r["images_per_sec"]

    r = bench_infer.run(get_config("dpt-384"), batch=16, record=False)
    results["dpt384_b16_infer_images_per_sec"] = r["images_per_sec"]

    cfg = get_config("live")
    state = looplib.create_state(cfg)
    from ann3depth_tpu.models import registry
    eng = LiveEngine(state.apply_fn, state.params, cfg.live.frame_hw,
                     cfg.data.input_hw, display_hw=cfg.live.frame_hw,
                     emit_s2d=registry.s2d_input_factor(cfg.model.name))
    results["live_device_step_ms_max"] = eng.device_step_latency() * 1e3

    for key, (floor, ref) in FLOORS.items():
        value = results[key]
        ok = value <= floor if key.endswith("_max") else value >= floor
        if not ok:
            failures.append({"metric": key, "value": value, "floor": floor,
                             "round1_ref": ref})

    print(json.dumps({"results": {k: round(v, 2) for k, v in results.items()},
                      "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
