"""Headline benchmark: encdec training throughput (config [B:8]) on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures steady-state images/sec of the full fused training step (uint8
frames -> on-device preprocess -> fwd/bwd -> update) at batch 16, 320x240
input / 160x120 depth. Host batches are pre-generated and device transfers
overlap compute, so this times the device pipeline, not numpy.

`vs_baseline` compares against the reference's training throughput. The
reference itself was unavailable/unrunnable (SURVEY.md §0), so the recorded
baseline is a measured proxy: the same encoder-decoder architecture
implemented in torch (the reference's runtime family) on this machine's CPU
— see benchmarks/torch_reference_proxy.py and BASELINE.md. Target: >=10x
[B:5].
"""

from __future__ import annotations

import json
import time

import numpy as np

# Measured via benchmarks/torch_reference_proxy.py (see BASELINE.md):
# torch-CPU encdec train step, batch 16 @ 240x320 -> images/sec.
REFERENCE_PROXY_IMAGES_PER_SEC = 1.94

BATCH = 16
RAW_HW = (480, 640)       # raw frame size shipped to device (uint8)
INPUT_HW = (240, 320)     # model input [B:8]
TARGET_HW = (120, 160)    # depth target [B:8]
WARMUP = 10
STEPS = 100  # amortize the tunnel's per-sync RTT (~tens of ms)


def main():
    import jax

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.parallel import mesh as meshlib
    from ann3depth_tpu.train import step as steplib

    cfg = get_config("make3d-encdec")
    model = registry.build(cfg.model)
    params = steplib.init_params(model, INPUT_HW, seed=0)
    tx = steplib.make_optimizer(1e-4)
    state = steplib.TrainState.create(model.apply, params, tx)

    mesh = meshlib.create_mesh()
    state = meshlib.replicate(state, mesh)
    sharding = meshlib.batch_sharding(mesh)
    rng = jax.device_put(jax.random.key(0), meshlib.replicated(mesh))

    # Pre-generate a pool of host batches; rotate through them on device.
    rng_np = np.random.default_rng(0)
    pool = []
    for _ in range(4):
        img = rng_np.integers(0, 256, (BATCH, *RAW_HW, 3), dtype=np.uint8)
        dep = rng_np.uniform(1.0, 60.0, (BATCH, 48, 64)).astype(np.float32)
        pool.append((jax.device_put(img, sharding), jax.device_put(dep, sharding)))

    kw = dict(input_hw=INPUT_HW, target_hw=TARGET_HW, si_lambda=0.5,
              augment=True, use_pallas=False)  # XLA preprocess: faster in-step (BASELINE.md)

    # NOTE: sync via device_get of a scalar, NOT block_until_ready — the
    # axon TPU tunnel acks dispatch before compute finishes, so
    # block_until_ready under-measures wildly (verified 2026-08-16).
    for i in range(WARMUP):
        img, dep = pool[i % len(pool)]
        state, metrics = steplib.train_step(state, img, dep, rng, **kw)
    float(jax.device_get(metrics["loss"]))

    t0 = time.perf_counter()
    for i in range(STEPS):
        img, dep = pool[i % len(pool)]
        state, metrics = steplib.train_step(state, img, dep, rng, **kw)
    loss = float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    assert loss == loss, "NaN loss in benchmark"

    ips = BATCH * STEPS / dt
    print(json.dumps({
        "metric": "train_images_per_sec_encdec_b16_320x240",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / REFERENCE_PROXY_IMAGES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
