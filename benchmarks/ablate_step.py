"""Step-time ablation: where do the 2.4 ms/step at b16 go? (VERDICT r1 #3/#4)

Times, on the real TPU with device_get sync (tunnel-safe):
  - full train step, XLA vs Pallas preprocess
  - preprocess alone (jitted standalone), XLA vs Pallas, f32 vs bf16-out
  - model fwd+bwd+update alone (preprocessed inputs)
  - a scan-of-K-steps program to separate dispatch overhead from device time

Run: python -m benchmarks.ablate_step [batch]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timeit(fn, sync, warmup=5, iters=30):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main(batch=16):
    import jax
    import jax.numpy as jnp

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.ops import pallas_preprocess as pp
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

    def sync_metrics(out):
        float(jax.device_get(out[1]["loss"]))

    def sync_arr(x):
        # scalar-index on device then fetch ONE element: a full device_get
        # of a fresh 14.7 MB output costs ~150 ms through the tunnel and
        # would swamp the measurement.
        float(jax.device_get(x[0, 0, 0, 0]))

    results = {}

    # --- full step, xla vs pallas preprocess ---
    for impl, use_pallas in (("xla", False), ("pallas", True)):
        state = jax.tree.map(jnp.copy, state0)

        def run(state=state, use_pallas=use_pallas):
            return steplib.train_step(
                state, img, dep, rng, input_hw=INPUT_HW, target_hw=TARGET_HW,
                si_lambda=0.5, augment=True, use_pallas=use_pallas)

        # keep state fixed (donation consumes it) -> re-copy per call is
        # too slow; instead let the state thread through
        state_box = [state]

        def run_thread(use_pallas=use_pallas):
            s, m = steplib.train_step(
                state_box[0], img, dep, rng, input_hw=INPUT_HW,
                target_hw=TARGET_HW, si_lambda=0.5, augment=True,
                use_pallas=use_pallas)
            state_box[0] = s
            return s, m

        results[f"train_step_{impl}_ms"] = timeit(
            run_thread, sync_metrics) * 1e3

    # --- preprocess alone ---
    key = jax.random.key(1)
    img_params = pp.augment_params(key, batch, RAW_HW, INPUT_HW)

    fused_f32 = jax.jit(lambda x, p: pp.fused_preprocess(
        x, p, out_hw=INPUT_HW))
    oracle = jax.jit(lambda x, p: pp.oracle_preprocess(
        x, p, out_hw=INPUT_HW))
    results["preprocess_pallas_ms"] = timeit(
        lambda: fused_f32(img, img_params), sync_arr) * 1e3
    results["preprocess_xla_ms"] = timeit(
        lambda: oracle(img, img_params), sync_arr) * 1e3

    # --- model fwd+bwd+update alone (preprocessed inputs) ---
    images = oracle(img, img_params)
    depths = jnp.asarray(
        rng_np.uniform(1, 60, (batch, *TARGET_HW)).astype(np.float32))

    @jax.jit
    def model_step(state, images, depths):
        (loss, _), grads = jax.value_and_grad(
            steplib.loss_fn, has_aux=True)(
            state.params, state.apply_fn, images, depths, 0.5)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = __import__("optax").apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), loss

    state_box = [jax.tree.map(jnp.copy, state0)]

    def run_model():
        s, l = model_step(state_box[0], images, depths)
        state_box[0] = s
        return s, l

    results["model_only_ms"] = timeit(
        run_model, lambda out: float(jax.device_get(out[1]))) * 1e3

    # --- scan of K steps in ONE program: dispatch-free per-step time.
    # The cleanest xla-vs-pallas in-step comparison (no tunnel noise). ---
    K = 20

    for impl, use_pallas in (("xla", False), ("pallas", True)):
        def one(state, _, use_pallas=use_pallas):
            s, m = steplib.train_step.__wrapped__(
                state, img, dep, rng, input_hw=INPUT_HW, target_hw=TARGET_HW,
                si_lambda=0.5, augment=True, use_pallas=use_pallas)
            return s, m["loss"]

        @jax.jit
        def scan_steps(state, one=one):
            return jax.lax.scan(one, state, None, length=K)

        state = jax.tree.map(jnp.copy, state0)
        sc = timeit(lambda: scan_steps(state),
                    lambda out: float(jax.device_get(out[1][-1])),
                    warmup=2, iters=5)
        results[f"scan_per_step_{impl}_ms"] = sc / K * 1e3

    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
