"""Offline/serving inference throughput: raw uint8 frames -> linear depth.

Measures the full batched serving program (on-device preprocess + forward
+ exp) as a scan-of-K device pipeline, the same tunnel-proof discipline as
bench_train. Appends a JSONL record; BASELINE.md carries the numbers.

Run: python -m benchmarks.bench_infer [config] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")


def run(cfg, batch=32, steps=60, raw_hw=(480, 640), record=True,
        model=None, tag=None):
    import jax
    import jax.numpy as jnp

    from ann3depth_tpu.models import registry
    from ann3depth_tpu.pipeline import preprocess
    from ann3depth_tpu.train import step as steplib

    model = model if model is not None else registry.build(cfg.model)
    params = steplib.init_params(model, cfg.data.input_hw, seed=0)
    emit = registry.s2d_input_factor(cfg.model.name)
    input_hw = tuple(cfg.data.input_hw)

    # Pool generated ON DEVICE: a host pool at b128 is ~472 MB of H2D,
    # which through this environment's tunnel dwarfs the benchmark itself.
    pool = jax.jit(lambda k: jax.random.randint(
        k, (4, batch, *raw_hw, 3), 0, 256, jnp.int32).astype(jnp.uint8))(
        jax.random.key(0))

    def infer(img_u8):
        # DEFAULT resize precision is the serving production choice (the
        # model computes in bf16 anyway); preprocess_image itself defaults
        # to HIGHEST for eval/live parity (ADVICE r2).
        images = preprocess.preprocess_image(
            img_u8, input_hw, emit_s2d=emit,
            precision=jax.lax.Precision.DEFAULT)
        pred_log = model.apply({"params": params}, images)
        return jnp.exp(pred_log[..., 0])

    K = 30

    # pool is a formal ARGUMENT, not a closure capture: a closed-over
    # concrete array is embedded in the HLO as a constant — at b128
    # that's a 472 MB compile request the tunnel rejects (HTTP 413).
    @jax.jit
    def run_k(c, pool):
        def one(carry, i):
            img = jax.lax.dynamic_index_in_dim(pool, i % pool.shape[0], 0,
                                               keepdims=False)
            out = infer(img)
            # fold a scalar through the carry so the scan can't be elided
            return carry + out[0, 0, 0], carry

        return jax.lax.scan(one, c, jnp.arange(K))

    # FLOPs of ONE inference batch for serving MFU (flops.py). Lower a
    # single-batch program — XLA's cost_analysis counts a scan body once
    # regardless of trip count, so analyzing run_k would undercount by K.
    from benchmarks import flops as flopslib

    batch_fl = flopslib.step_flops(jax.jit(infer), pool[0])

    c = jnp.zeros((), jnp.float32)
    for _ in range(2):
        c, _ = run_k(c, pool)
    float(jax.device_get(c))
    reps = max(1, steps // K)
    t0 = time.perf_counter()
    for _ in range(reps):
        c, _ = run_k(c, pool)
    float(jax.device_get(c))
    dt = time.perf_counter() - t0
    total = reps * K

    result = {
        "bench": "infer_throughput",
        "model": tag or cfg.model.name,
        "batch_size": batch,
        "input_hw": list(input_hw),
        "backend": jax.default_backend(),
        "images_per_sec": round(batch * total / dt, 2),
        "batch_ms": round(dt / total * 1e3, 3),
        "time": time.time(),
    }
    quant = getattr(model, "quant", getattr(cfg.model, "quant", "none"))
    flopslib.attach_mfu(result, batch_fl, total, dt,
                        dtype="int8" if quant == "int8" else "bf16")
    flopslib.attach_memory(result)
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    from ann3depth_tpu.config import get_config

    name = sys.argv[1] if len(sys.argv) > 1 else "make3d-encdec"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(json.dumps(run(get_config(name), batch=batch)))
