"""A/B: preprocess emitting the space-to-depth layout vs RGB + in-model s2d.

docs/design.md §2b identified ~180 us/step of layout copies around the
encdec stem (cast + reshape-transpose at models/encdec.py). The s2d-emitting
preprocess (ops/pallas_preprocess.oracle_preprocess_s2d) folds that relayout
into the resize einsums. This measures both as scan-of-K programs on the
real TPU (dispatch-free per-step time, tunnel-proof).

Run: python -m benchmarks.exp_s2d_stem [batch]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(batch=16):
    import jax
    import jax.numpy as jnp

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.train import step as steplib

    RAW_HW, INPUT_HW, TARGET_HW = (480, 640), (240, 320), (120, 160)
    cfg = get_config("make3d-encdec")
    model = registry.build(cfg.model)
    params = steplib.init_params(model, INPUT_HW, seed=0)
    tx = steplib.make_optimizer(1e-4)
    state0 = steplib.TrainState.create(model.apply, params, tx)

    rng_np = np.random.default_rng(0)
    img = jnp.asarray(rng_np.integers(0, 256, (batch, *RAW_HW, 3), np.uint8))
    dep = jnp.asarray(rng_np.uniform(1, 60, (batch, 48, 64)).astype(np.float32))
    rng = jax.random.key(0)

    K = 20
    results = {}
    for name, emit in (("rgb", 0), ("s2d", 4)):
        def one(state, _, emit=emit):
            s, m = steplib.train_step.__wrapped__(
                state, img, dep, rng, input_hw=INPUT_HW, target_hw=TARGET_HW,
                si_lambda=0.5, augment=True, emit_s2d=emit)
            return s, m["loss"]

        @jax.jit
        def scan_steps(state, one=one):
            return jax.lax.scan(one, state, None, length=K)

        state = jax.tree.map(jnp.copy, state0)
        for _ in range(2):
            out = scan_steps(state)
        float(jax.device_get(out[1][-1]))
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = scan_steps(state)
        last = float(jax.device_get(out[1][-1]))
        dt = (time.perf_counter() - t0) / iters / K
        results[f"scan_per_step_{name}_ms"] = round(dt * 1e3, 3)
        results[f"loss_{name}"] = round(last, 5)

    results["speedup_pct"] = round(
        100 * (results["scan_per_step_rgb_ms"] / results["scan_per_step_s2d_ms"]
               - 1), 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
