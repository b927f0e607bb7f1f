"""Decompose the train-vs-serve MFU gap (VERDICT r2 item 5).

Serving reaches MFU 0.483 at b128 while training sits flat at ~0.33
(BASELINE.md). This ladder isolates where the backward pass loses it:

  rung 1  fwd:      preprocess + forward + loss
  rung 2  fwd+bwd:  value_and_grad (no optimizer)
  rung 3  full:     grad + adamw update (the production step)

Each rung is a scan-of-K program (device-resident inputs, one dispatch
per K steps — tunnel-proof) with XLA cost_analysis FLOPs for per-rung
MFU. bwd time = rung2 - rung1; optimizer time = rung3 - rung2.

Run: python -m benchmarks.exp_fwd_bwd [batch ...]   (default: 16 128)
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")
RAW_HW, INPUT_HW, TARGET_HW = (480, 640), (240, 320), (120, 160)
K = 20


def _sync_scalar(x):
    return float(jax.device_get(x))


def _timeit(fn, warmup=2, iters=5):
    for _ in range(warmup):
        out = fn()
    _sync_scalar(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync_scalar(out)
    return (time.perf_counter() - t0) / iters


def ladder(batch=16, record=True):
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.pipeline import preprocess
    from ann3depth_tpu.train import losses
    from ann3depth_tpu.train import step as steplib
    from benchmarks import flops as flopslib

    cfg = get_config("make3d-encdec")
    model = registry.build(cfg.model)
    params = steplib.init_params(model, INPUT_HW, seed=0)
    tx = steplib.make_optimizer(1e-4)
    state0 = steplib.TrainState.create(model.apply, params, tx)
    emit = registry.s2d_input_factor(cfg.model.name)

    # inputs generated on device (a host pool at b128 is ~118 MB of H2D)
    kimg, kdep = jax.random.split(jax.random.key(0))
    img = jax.jit(lambda k: jax.random.randint(
        k, (batch, *RAW_HW, 3), 0, 256, jnp.int32).astype(jnp.uint8))(kimg)
    dep = jax.jit(lambda k: jax.random.uniform(
        k, (batch, 48, 64), jnp.float32, 1.0, 60.0))(kdep)
    rng = jax.random.key(1)

    def pre(img_u8, dep_raw, key):
        return preprocess.preprocess_batch(
            img_u8, dep_raw, INPUT_HW, TARGET_HW, key=key,
            precision=jax.lax.Precision.DEFAULT, emit_s2d=emit)

    def fwd_loss(params, images, depths):
        pred = model.apply({"params": params}, images)
        return losses.scale_invariant_log_loss(pred, depths, lam=0.5)

    # --- single-step bodies (scan carries force all work to happen).
    # img/dep/params are formal jit ARGUMENTS, never closure captures: a
    # closed-over concrete array embeds in the HLO as a constant, and at
    # b256 the uint8 pool is ~236 MB of compile request through the
    # tunnel (the bench_infer.py HTTP-413 hazard). ---
    def body_fwd(c, img, dep, params):
        key = jax.random.fold_in(rng, c.astype(jnp.int32))
        images, depths = pre(img, dep, key)
        return c + fwd_loss(params, images, depths)

    def body_fwdbwd(c, img, dep, params):
        key = jax.random.fold_in(rng, c.astype(jnp.int32))
        images, depths = pre(img, dep, key)
        loss, grads = jax.value_and_grad(fwd_loss)(params, images, depths)
        return c + loss + optax.global_norm(grads)

    def body_full(state, img, dep):
        s, m = steplib.train_step.__wrapped__(
            state, img, dep, rng, input_hw=INPUT_HW, target_hw=TARGET_HW,
            si_lambda=0.5, augment=True, emit_s2d=emit)
        return s, m["loss"]

    @jax.jit
    def scan_fwd(c, img, dep, params):
        return jax.lax.scan(lambda c, _: (body_fwd(c, img, dep, params),
                                          None), c, None, length=K)[0]

    @jax.jit
    def scan_fwdbwd(c, img, dep, params):
        return jax.lax.scan(lambda c, _: (body_fwdbwd(c, img, dep, params),
                                          None), c, None, length=K)[0]

    @jax.jit
    def scan_full(state, img, dep):
        s, ls = jax.lax.scan(lambda s, _: body_full(s, img, dep),
                             state, None, length=K)
        return ls[-1]

    # FLOPs per rung from single-step programs (cost_analysis counts a
    # scan body once regardless of trip count — bench_infer.py rationale).
    c0 = jnp.zeros((), jnp.float32)
    params0 = state0.params
    fl_fwd = flopslib.step_flops(jax.jit(body_fwd), c0, img, dep, params0)
    fl_fwdbwd = flopslib.step_flops(jax.jit(body_fwdbwd), c0, img, dep,
                                    params0)
    fl_full = flopslib.step_flops(
        jax.jit(lambda s, i, d: body_full(s, i, d)[0]),
        jax.tree.map(jnp.copy, state0), img, dep)

    t_fwd = _timeit(lambda: scan_fwd(c0, img, dep, params0)) / K
    t_fwdbwd = _timeit(lambda: scan_fwdbwd(c0, img, dep, params0)) / K
    state = jax.tree.map(jnp.copy, state0)
    t_full = _timeit(lambda: scan_full(state, img, dep)) / K

    peak = flopslib.device_peak_flops() or float("nan")

    def mfu(fl, t):
        return round(fl / t / peak, 4) if fl else None

    result = {
        "bench": "fwd_bwd_ladder",
        "model": "encdec",
        "batch": batch,
        "backend": jax.default_backend(),
        "fwd_ms": round(t_fwd * 1e3, 3),
        "fwdbwd_ms": round(t_fwdbwd * 1e3, 3),
        "full_ms": round(t_full * 1e3, 3),
        "bwd_only_ms": round((t_fwdbwd - t_fwd) * 1e3, 3),
        "optimizer_ms": round((t_full - t_fwdbwd) * 1e3, 3),
        "fwd_tflops": round((fl_fwd or 0) / 1e12, 4),
        "fwdbwd_tflops": round((fl_fwdbwd or 0) / 1e12, 4),
        "full_tflops": round((fl_full or 0) / 1e12, 4),
        "mfu_fwd": mfu(fl_fwd, t_fwd),
        "mfu_fwdbwd": mfu(fl_fwdbwd, t_fwdbwd),
        "mfu_full": mfu(fl_full, t_full),
        # effective MFU of the bwd increment alone
        "mfu_bwd_marginal": (
            round((fl_fwdbwd - fl_fwd) / (t_fwdbwd - t_fwd) / peak, 4)
            if fl_fwd and fl_fwdbwd and t_fwdbwd > t_fwd else None),
        "images_per_sec_full": round(batch / t_full, 1),
        "time": time.time(),
    }
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    batches = [int(a) for a in sys.argv[1:]] or [16, 128]
    for b in batches:
        print(json.dumps(ladder(b)), flush=True)
