"""Step-time experiment matrix: s2d-emitting preprocess x decoder-upsample
impl x norm ablation (docs/design.md §2b follow-ups).

Variants (encdec b16, scan-of-K on the real TPU, device_get sync):
  base        rgb preprocess + jax.image.resize upsample + GroupNorm
  s2d         s2d-emitting preprocess (stem relayout fused into resize)
  s2d+mm      + decoder x2 upsample as fixed triangle matmuls
  s2d+mm+nn   + norm="none" — NOT a candidate (training dynamics), only
              bounds what the GroupNorm stats actually cost in-step.

Run: python -m benchmarks.exp_micro_opts [batch]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def measure(model, emit, batch, K=20, iters=5):
    import jax
    import jax.numpy as jnp

    from ann3depth_tpu.train import step as steplib

    RAW_HW, INPUT_HW, TARGET_HW = (480, 640), (240, 320), (120, 160)
    params = steplib.init_params(model, INPUT_HW, seed=0)
    tx = steplib.make_optimizer(1e-4)
    state = steplib.TrainState.create(model.apply, params, tx)

    rng_np = np.random.default_rng(0)
    img = jnp.asarray(rng_np.integers(0, 256, (batch, *RAW_HW, 3), np.uint8))
    dep = jnp.asarray(rng_np.uniform(1, 60, (batch, 48, 64)).astype(np.float32))
    rng = jax.random.key(0)

    def one(state, _):
        s, m = steplib.train_step.__wrapped__(
            state, img, dep, rng, input_hw=INPUT_HW, target_hw=TARGET_HW,
            si_lambda=0.5, augment=True, emit_s2d=emit)
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


def main(batch=16):
    from ann3depth_tpu.models.encdec import EncDecDepthNet

    variants = {
        "base": (dict(), 0),
        "s2d": (dict(), 4),
        "s2d+mm": (dict(upsample="matmul"), 4),
        "s2d+mm+nonorm": (dict(upsample="matmul", norm="none"), 4),
    }
    results = {}
    for name, (kw, emit) in variants.items():
        ms, loss = measure(EncDecDepthNet(**kw), emit, batch)
        results[f"{name}_ms"] = round(ms, 3)
        results[f"{name}_loss"] = round(loss, 5)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
