"""A/B: Pallas preprocess v2 (precomputed weight matrices) vs v1 vs XLA.

The r2 diagnosis (docs/design.md §2) blamed the v1 kernel's losses on
(a) the custom-call fusion barrier and (b) in-kernel construction of the
1.84 M-element interleaved column matrix. v2 eliminates (b) by building
the per-example matrices in XLA and DMA-ing them in — this measures
whether that closes the gap (VERDICT r2 item 6: win or retire for good).

Standalone: per-batch time of each impl, honest scalar sync.
In-step: scan-of-K full train step with each preprocess impl.

Run: python -m benchmarks.exp_pallas_v2 [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")
RAW_HW, INPUT_HW, TARGET_HW = (480, 640), (240, 320), (120, 160)
K = 20


def _timeit(fn, sync, warmup=3, iters=10):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main(batch=16, record=True):
    from ann3depth_tpu.ops import pallas_preprocess as pp
    from ann3depth_tpu.train import step as steplib
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.models import registry

    assert jax.default_backend() == "tpu", "kernel A/B needs the TPU"
    rng_np = np.random.default_rng(0)
    img = jnp.asarray(rng_np.integers(0, 256, (batch, *RAW_HW, 3), np.uint8))
    dep = jnp.asarray(rng_np.uniform(1, 60, (batch, 48, 64)
                                     ).astype(np.float32))
    key = jax.random.key(1)
    params = pp.augment_params(key, batch, RAW_HW, INPUT_HW)

    def sync_elem(x):
        float(jax.device_get(x[0, 0, 0, 0]))

    impls = {
        "xla_default": jax.jit(lambda x, p: pp.oracle_preprocess(
            x, p, out_hw=INPUT_HW, precision=jax.lax.Precision.DEFAULT)),
        "xla_highest": jax.jit(lambda x, p: pp.oracle_preprocess(
            x, p, out_hw=INPUT_HW)),
        "pallas_v1": jax.jit(lambda x, p: pp.fused_preprocess(
            x, p, out_hw=INPUT_HW)),
        "pallas_v2": jax.jit(lambda x, p: pp.fused_preprocess_v2(
            x, p, out_hw=INPUT_HW)),
    }
    results = {"bench": "pallas_v2_ab", "batch": batch,
               "backend": jax.default_backend()}
    for name, fn in impls.items():
        results[f"standalone_{name}_ms"] = round(
            _timeit(lambda fn=fn: fn(img, params), sync_elem) * 1e3, 3)

    # Scan-of-K standalone: param + weight construction inside the
    # program, one dispatch per K batches — the dispatch-noise-free
    # numbers the adopt/retire decision is based on (docs/design.md §2).
    base_key = jax.random.key(1)

    def make_standalone_scan(fn):
        def body(c, i, img):
            p = pp.augment_params(jax.random.fold_in(base_key, i),
                                  batch, RAW_HW, INPUT_HW)
            out = fn(img, p)
            return c + out[0, 0, 0, 0], None

        @jax.jit
        def scan(c, img):
            return jax.lax.scan(lambda c, i: body(c, i, img), c,
                                jnp.arange(K))[0]

        return scan

    for name, raw_fn in {
        "xla_default": lambda x, p: pp.oracle_preprocess(
            x, p, out_hw=INPUT_HW, precision=jax.lax.Precision.DEFAULT),
        "pallas_v1": lambda x, p: pp.fused_preprocess(x, p, out_hw=INPUT_HW),
        "pallas_v2": lambda x, p: pp.fused_preprocess_v2(
            x, p, out_hw=INPUT_HW),
    }.items():
        scan = make_standalone_scan(raw_fn)
        c0 = jnp.zeros((), jnp.float32)
        t = _timeit(lambda: scan(c0, img),
                    lambda out: float(jax.device_get(out)),
                    warmup=2, iters=5)
        results[f"standalone_scan_{name}_ms_per_batch"] = round(
            t / K * 1e3, 3)

    # --- in-step: full train step scan-of-K with each preprocess impl ---
    cfg = get_config("make3d-encdec")
    model = registry.build(cfg.model)
    mparams = steplib.init_params(model, INPUT_HW, seed=0)
    tx = steplib.make_optimizer(1e-4)
    state0 = steplib.TrainState.create(model.apply, mparams, tx)
    rng = jax.random.key(0)
    emit = registry.s2d_input_factor(cfg.model.name)

    from ann3depth_tpu.train import losses

    def make_scan(impl):
        def preprocess_pair(pkey, img, dep):
            img_p = pp.augment_params(pkey, batch, RAW_HW, INPUT_HW)
            dep_p = pp.augment_params(pkey, batch, (48, 64), TARGET_HW)
            if impl == "xla":
                from ann3depth_tpu.pipeline import preprocess as prep
                return prep.preprocess_batch(
                    img, dep, INPUT_HW, TARGET_HW, key=pkey,
                    precision=jax.lax.Precision.DEFAULT, emit_s2d=emit)
            fn = (pp.fused_preprocess if impl == "pallas_v1"
                  else pp.fused_preprocess_v2)
            images = fn(img, img_p, out_hw=INPUT_HW)
            depths = fn(dep[..., None], dep_p, out_hw=TARGET_HW,
                        depth_mode=True)[..., 0]
            return images, depths

        def body_with(state, img, dep):
            pkey = jax.random.fold_in(rng, state.step)
            images, depths = preprocess_pair(pkey, img, dep)

            def loss_fn(p):
                pred = state.apply_fn({"params": p}, images)
                return losses.scale_invariant_log_loss(pred, depths, lam=0.5)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            import optax
            updates, new_opt = state.tx.update(grads, state.opt_state,
                                               state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=new_params,
                                 opt_state=new_opt), loss

        @jax.jit
        def scan_steps(state, img, dep):
            s, ls = jax.lax.scan(lambda s, _: body_with(s, img, dep),
                                 state, None, length=K)
            return ls[-1]

        return scan_steps

    for impl in ("xla", "pallas_v1", "pallas_v2"):
        scan = make_scan(impl)
        state = jax.tree.map(jnp.copy, state0)
        t = _timeit(lambda: scan(state, img, dep),
                    lambda out: float(jax.device_get(out)),
                    warmup=2, iters=5)
        results[f"instep_{impl}_ms_per_step"] = round(t / K * 1e3, 3)

    results["time"] = time.time()
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(results) + "\n")
    return results


if __name__ == "__main__":
    print(json.dumps(main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)))
