"""Does the AOT-exported serving artifact pay any overhead vs in-process jit?

Times the SAME serving program (uint8 480x640 pool -> preprocess ->
forward -> exp) two ways on the real TPU, scan-of-K with a device-side
pool (the bench_infer discipline):
  - direct: jit(make_serving_fn(...)) called in the scan body
  - exported: jax.export round-trip (serialize -> deserialize -> .call)
    called in the scan body

jax.export re-stages the saved StableHLO into the enclosing program, so
the expectation is parity; this measures it rather than asserting it.

Run: python -m benchmarks.exp_export_serving [batch]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")


def main(batch=32, K=30, iters=2, record=True):
    import jax
    import jax.numpy as jnp

    from ann3depth_tpu import serving as slib
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.train import step as steplib

    cfg = get_config("make3d-encdec")
    model = registry.build(cfg.model)
    params = steplib.init_params(model, cfg.data.input_hw, seed=0)
    fn = slib.make_serving_fn(model, cfg.model.name, cfg.data.input_hw)

    raw_hw = (480, 640)
    pool = jax.jit(lambda k: jax.random.randint(
        k, (4, batch, *raw_hw, 3), 0, 256, jnp.int32).astype(jnp.uint8))(
        jax.random.key(0))

    with tempfile.TemporaryDirectory() as td:
        slib.export_serving(cfg, params, td, batch=batch, raw_hw=raw_hw)
        loaded = slib.load_serving(td)
    exported_call = loaded._exported.call

    def time_variant(call):
        @jax.jit
        def run_k(c, params, pool):
            def one(carry, i):
                img = jax.lax.dynamic_index_in_dim(
                    pool, i % pool.shape[0], 0, keepdims=False)
                out = call(params, img)
                return carry + out[0, 0, 0], carry

            return jax.lax.scan(one, c, jnp.arange(K))

        c = jnp.zeros((), jnp.float32)
        for _ in range(2):
            c, _ = run_k(c, params, pool)
        float(jax.device_get(c))
        t0 = time.perf_counter()
        for _ in range(iters):
            c, _ = run_k(c, params, pool)
        float(jax.device_get(c))
        return (time.perf_counter() - t0) / iters / K * 1e3

    direct_ms = time_variant(fn)
    exported_ms = time_variant(exported_call)

    result = {
        "bench": "export_serving_overhead",
        "model": cfg.model.name,
        "batch_size": batch,
        "backend": jax.default_backend(),
        "direct_batch_ms": round(direct_ms, 3),
        "exported_batch_ms": round(exported_ms, 3),
        "overhead_pct": round(100 * (exported_ms / direct_ms - 1), 2),
        "direct_img_s": round(batch / direct_ms * 1e3, 1),
        "exported_img_s": round(batch / exported_ms * 1e3, 1),
        "time": time.time(),
    }
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
