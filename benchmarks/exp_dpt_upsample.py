"""A/B: DPT fusion-head upsampling as gather-resize vs fixed matmuls.

The DPT head runs five bilinear upsamples on [B, {24..96}^2, 128] feature
maps (plus the final 1-channel x2). jax.image.resize lowers to gathers
with layout transposes around them; ops/resize.upsample_matmul keeps NHWC
through einsum dots (same math — the encdec decoder measured +1.7% step
from this swap, benchmarks/exp_micro_opts).

Run: python -m benchmarks.exp_dpt_upsample [batch]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def measure(model, batch, K=10, iters=3):
    import jax
    import jax.numpy as jnp

    from ann3depth_tpu.train import step as steplib

    RAW_HW, INPUT_HW = (480, 640), (384, 384)
    params = steplib.init_params(model, INPUT_HW, seed=0)
    tx = steplib.make_optimizer(1e-4)
    state = steplib.TrainState.create(model.apply, params, tx)

    rng_np = np.random.default_rng(0)
    img = jnp.asarray(rng_np.integers(0, 256, (batch, *RAW_HW, 3), np.uint8))
    dep = jnp.asarray(rng_np.uniform(1, 60, (batch, 48, 64)).astype(np.float32))
    rng = jax.random.key(0)

    def one(state, _):
        s, m = steplib.train_step.__wrapped__(
            state, img, dep, rng, input_hw=INPUT_HW, target_hw=INPUT_HW,
            si_lambda=0.5, augment=True)
        return s, m["loss"]

    @jax.jit
    def scan_steps(state):
        return jax.lax.scan(one, state, None, length=K)

    for _ in range(2):
        out = scan_steps(state)
    float(jax.device_get(out[1][-1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = scan_steps(state)
    last = float(jax.device_get(out[1][-1]))
    dt = (time.perf_counter() - t0) / iters / K
    return dt * 1e3, last


def main(batch=8):
    from ann3depth_tpu.models.dpt import DPTDepthNet

    results = {}
    for name, ups in (("resize", "resize"), ("matmul", "matmul")):
        model = DPTDepthNet(remat=False, upsample=ups)
        ms, loss = measure(model, batch)
        results[f"{name}_ms"] = round(ms, 3)
        results[f"{name}_loss"] = round(loss, 5)
    results["speedup_pct"] = round(
        100 * (results["resize_ms"] / results["matmul_ms"] - 1), 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
