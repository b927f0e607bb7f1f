"""Synthetic-data convergence study (VERDICT r2 item 4): price the
quality-gated perf levers on TRAINED weights instead of random init.

Trains encdec and DPT-384 to loss plateau on the synthetic dataset
(data/synthetic.py renders geometry -> RGB+depth, so the nets genuinely
fit it), then measures on the trained checkpoints:

  a) encdec: int8 serving twin (ops/quant.py) vs bf16 — eval RMSE delta
     and log-depth divergence (BASELINE.md's random-init numbers said
     little about trained activation distributions).
  b) DPT: head_stride=4 vs 2 — same trained params (the fusion-head param
     tree is stride-independent), eval RMSE both ways. head_stride=4 is
     +14.2% train / +27.6% serve (BASELINE.md); this prices its cost.

The dataset is staged into HBM once (uint8 pool) and batches are gathered
on device per step — through this environment's tunnel a per-step host
feed would cost ~300 ms/step of upload; with the pool the whole study is
minutes. (A local-chip deployment would just use the normal DeviceFeed.)

Run: python -m benchmarks.exp_convergence encdec [steps]
     python -m benchmarks.exp_convergence dpt [steps]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")


def _device_pool(ds):
    """Single-device HBM pool. Deliberately NOT DevicePoolSampler (which
    yields gathered batches as separate dispatches): the study fuses the
    gather INTO the train step (`_pool_train_step`) so each step is one
    device program — same HBM-resident-pool design, experiment-local
    sampling."""
    from ann3depth_tpu.pipeline.device_cache import stack_dataset

    img, dep = stack_dataset(ds)
    return jax.device_put(img), jax.device_put(dep)


@functools.partial(
    jax.jit, donate_argnames=("state",),
    static_argnames=("input_hw", "target_hw", "si_lambda", "augment",
                     "emit_s2d", "ema_decay", "loss_kind"))
def _pool_train_step(state, pool_img, pool_dep, idx, rng, *, input_hw,
                     target_hw, si_lambda, augment, emit_s2d,
                     ema_decay=0.0, loss_kind="si"):
    """Gather a batch from the HBM pool and run the fused train step —
    one device program per step, no host feed."""
    from ann3depth_tpu.train import step as steplib

    img = pool_img[idx]
    dep = pool_dep[idx]
    return steplib.train_step.__wrapped__(
        state, img, dep, rng, input_hw=input_hw, target_hw=target_hw,
        si_lambda=si_lambda, augment=augment, emit_s2d=emit_s2d,
        ema_decay=ema_decay, loss_kind=loss_kind)


def _train_on_pool(model, cfg, pool, steps, batch, emit_s2d, seed=0,
                   log_every=200, ema_decay=0.0, loss_kind="si",
                   schedule="cosine"):
    import jax

    from ann3depth_tpu.train import step as steplib

    input_hw = tuple(cfg.data.input_hw)
    from ann3depth_tpu.models import registry
    target_hw = registry.output_hw(cfg.model.name, input_hw)

    params = steplib.init_params(model, input_hw, seed=seed)
    tx = steplib.make_optimizer(cfg.train.learning_rate,
                                cfg.train.warmup_steps, steps,
                                schedule=schedule)
    state = steplib.TrainState.create(model.apply, params, tx,
                                      ema=ema_decay > 0)
    pool_img, pool_dep = pool
    n = pool_img.shape[0]
    rng = jax.random.key(seed)
    host_rng = np.random.default_rng(seed)

    curve = []
    t0 = time.perf_counter()
    for i in range(steps):
        idx = host_rng.integers(0, n, (batch,))
        state, metrics = _pool_train_step(
            state, pool_img, pool_dep, idx, rng, input_hw=input_hw,
            target_hw=target_hw, si_lambda=cfg.train.si_lambda,
            augment=cfg.data.augment, emit_s2d=emit_s2d,
            ema_decay=ema_decay, loss_kind=loss_kind)
        if (i + 1) % log_every == 0 or i == steps - 1:
            m = jax.device_get(metrics)
            curve.append({"step": i + 1, "loss": round(float(m["loss"]), 5),
                          "rmse": round(float(m["rmse"]), 4)})
            print(f"  step {i+1}: loss={m['loss']:.4f} rmse={m['rmse']:.3f} "
                  f"({(time.perf_counter()-t0):.0f}s)", flush=True)
    return state, curve


def _eval_on_pool(apply_fn, params, cfg, pool, batch, target_hw,
                  model_name=None, tta=""):
    """Full-pool eval via global sufficient statistics (losses.py)."""
    import jax

    from ann3depth_tpu.train import losses
    from ann3depth_tpu.train import step as steplib

    state = steplib.TrainState.create(
        apply_fn, params, steplib.make_optimizer(1e-4))
    pool_img, pool_dep = pool
    n = pool_img.shape[0]
    totals = {}
    for lo in range(0, n - batch + 1, batch):
        stats = steplib.eval_stats_step(
            state, pool_img[lo:lo + batch], pool_dep[lo:lo + batch],
            input_hw=tuple(cfg.data.input_hw), target_hw=target_hw,
            si_lambda=cfg.train.si_lambda, tta=tta)
        for k, v in stats.items():
            totals[k] = totals[k] + v if k in totals else v
    totals = {k: float(v) for k, v in jax.device_get(totals).items()}
    return {k: round(float(v), 5)
            for k, v in losses.finalize_depth_metrics(totals).items()}


def study_encdec(steps=4000, batch=16, record=True):
    import jax
    import jax.numpy as jnp

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.models.encdec import EncDecDepthNet
    from ann3depth_tpu.pipeline import preprocess

    cfg = get_config("make3d-encdec")
    # Raw frames larger than the 240x320 input so the device resize is a
    # genuine downsample (the Make3D-shaped regime).
    train_ds = SyntheticDepthDataset(n=512, img_hw=(360, 480),
                                     depth_hw=(180, 240), seed=0)
    test_ds = SyntheticDepthDataset(n=64, img_hw=(360, 480),
                                    depth_hw=(180, 240), seed=1)
    print(f"staging pools to device ({len(train_ds)} train / "
          f"{len(test_ds)} test)...", flush=True)
    pool = _device_pool(train_ds)
    pool_test = _device_pool(test_ds)

    model = EncDecDepthNet()
    print(f"training encdec for {steps} steps @ b{batch}...", flush=True)
    state, curve = _train_on_pool(model, cfg, pool, steps, batch,
                                  emit_s2d=EncDecDepthNet.S2D_INPUT_FACTOR)

    target_hw = EncDecDepthNet.output_hw(cfg.data.input_hw)
    eval_bf16 = _eval_on_pool(model.apply, state.params, cfg, pool_test,
                              batch, target_hw)
    model_q = EncDecDepthNet(quant="int8")
    eval_int8 = _eval_on_pool(model_q.apply, state.params, cfg, pool_test,
                              batch, target_hw)

    # Log-depth divergence on trained weights, identical preprocessed input.
    img_u8 = pool_test[0][:16]
    images = preprocess.preprocess_image(img_u8, cfg.data.input_hw)
    y_bf = jax.device_get(jax.jit(model.apply)({"params": state.params},
                                               images))
    y_q = jax.device_get(jax.jit(model_q.apply)({"params": state.params},
                                                images))
    d = np.abs(np.asarray(y_q, np.float32) - np.asarray(y_bf, np.float32))

    result = {
        "bench": "convergence_encdec",
        "steps": steps, "batch": batch,
        "backend": jax.default_backend(),
        "loss_curve": curve,
        "eval_bf16": eval_bf16,
        "eval_int8": eval_int8,
        "int8_rmse_delta_pct": round(
            100 * (eval_int8["rmse"] / eval_bf16["rmse"] - 1), 3),
        "int8_mean_abs_dlogdepth": round(float(d.mean()), 5),
        "int8_max_abs_dlogdepth": round(float(d.max()), 5),
        "time": time.time(),
    }
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


def study_dpt(steps=2500, batch=8, record=True):
    import jax

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.models.dpt import DPTDepthNet

    cfg = get_config("dpt-384")
    train_ds = SyntheticDepthDataset(n=256, img_hw=(420, 560),
                                     depth_hw=(210, 280), seed=0)
    test_ds = SyntheticDepthDataset(n=64, img_hw=(420, 560),
                                    depth_hw=(210, 280), seed=1)
    print(f"staging pools to device ({len(train_ds)} train / "
          f"{len(test_ds)} test)...", flush=True)
    pool = _device_pool(train_ds)
    pool_test = _device_pool(test_ds)

    model = DPTDepthNet(remat=False)  # measured default (config.py)
    print(f"training dpt-384 for {steps} steps @ b{batch}...", flush=True)
    state, curve = _train_on_pool(model, cfg, pool, steps, batch,
                                  emit_s2d=0)

    target_hw = DPTDepthNet.output_hw(cfg.data.input_hw)
    eval_s2 = _eval_on_pool(model.apply, state.params, cfg, pool_test,
                            batch, target_hw)
    # Same trained params, coarser head (the param tree is identical —
    # upsample_out only skips the final x2; models/dpt.py head_stride).
    model_s4 = DPTDepthNet(remat=False, head_stride=4)
    eval_s4 = _eval_on_pool(model_s4.apply, state.params, cfg, pool_test,
                            batch, target_hw)

    result = {
        "bench": "convergence_dpt",
        "steps": steps, "batch": batch,
        "backend": jax.default_backend(),
        "loss_curve": curve,
        "eval_head_stride2": eval_s2,
        "eval_head_stride4": eval_s4,
        "head_stride4_rmse_delta_pct": round(
            100 * (eval_s4["rmse"] / eval_s2["rmse"] - 1), 3),
        "time": time.time(),
    }
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "encdec"
    if which == "encdec":
        steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
        print(json.dumps(study_encdec(steps=steps)))
    else:
        steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
        print(json.dumps(study_dpt(steps=steps)))
