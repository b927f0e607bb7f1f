"""Data-echoing quality pricing (the companion to exp_stream_pool's
throughput ladder).

The rotating-window pool changes the sampling distribution two ways:
window-granular shuffling (examples are drawn window-by-window rather
than globally) and echoing (each window trains `E` local passes before
the next is seen). This experiment prices exactly those index streams on
the standard encdec convergence protocol (exp_convergence: 512-image
synthetic set, 4000 steps b16, held-out eval) — the POOL stays fully
resident so every arm runs at device rate; only the index stream differs,
which is the honest isolation (quality depends on the sampling order, not
on which link staged the bytes).

Arms: iid baseline (exp_convergence's sampler), window=128 with
E in {1, 4, 16} by default; r5 extended the ladder with E in
{32, 64, 128} (run(echoes=...)). Measured (BASELINE.md): E<=16 is
within the protocol's +-1.1% seed-noise band, E=32/64 cost +4.7/+3.1%
eval RMSE, E=128 costs +12.2% — the knee that sets the auto
calibrator's max_epochs=64 clamp (streaming_pool.pick_window_epochs).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")


def _echo_indices(n, window, epochs, batch, rng):
    """The StreamingPoolSampler index stream, host-side: per pass one
    global permutation partitioned into windows; per window, `epochs`
    local shuffles drained in whole batches."""
    while True:
        perm = rng.permutation(n)
        for w in range(n // window):
            winidx = perm[w * window:(w + 1) * window]
            for _ in range(epochs):
                order = rng.permutation(window)
                for b0 in range(0, window - batch + 1, batch):
                    yield winidx[order[b0:b0 + batch]]


def run(steps=4000, batch=16, window=128, echoes=(1, 4, 16), record=True):
    import jax

    from exp_convergence import (_device_pool, _eval_on_pool,
                                 _pool_train_step)
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.train import step as steplib

    cfg = get_config("make3d-encdec")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=batch))
    train_ds = SyntheticDepthDataset(n=512, img_hw=(360, 480),
                                     depth_hw=(180, 240), seed=0)
    test_ds = SyntheticDepthDataset(n=64, img_hw=(360, 480),
                                    depth_hw=(180, 240), seed=1)
    pool = _device_pool(train_ds)
    pool_test = _device_pool(test_ds)
    input_hw = tuple(cfg.data.input_hw)
    target_hw = registry.output_hw(cfg.model.name, input_hw)
    emit_s2d = registry.s2d_input_factor(cfg.model.name)
    model = registry.build(cfg.model)

    def train_with_stream(label, idx_iter):
        params = steplib.init_params(model, input_hw, seed=0)
        tx = steplib.make_optimizer(cfg.train.learning_rate,
                                    cfg.train.warmup_steps, steps)
        state = steplib.TrainState.create(model.apply, params, tx)
        rng = jax.random.key(0)
        t0 = time.perf_counter()
        metrics = {}
        for i in range(steps):
            idx = next(idx_iter)
            state, metrics = _pool_train_step(
                state, pool[0], pool[1], idx, rng, input_hw=input_hw,
                target_hw=target_hw, si_lambda=cfg.train.si_lambda,
                augment=cfg.data.augment, emit_s2d=emit_s2d)
            if (i + 1) % 1000 == 0:
                m = jax.device_get(metrics)
                print(f"  [{label}] step {i+1}: loss={m['loss']:.4f} "
                      f"({time.perf_counter()-t0:.0f}s)", flush=True)
        final_loss = float(jax.device_get(metrics["loss"]))
        em = _eval_on_pool(model.apply, state.params, cfg, pool_test,
                           batch, target_hw)
        return {"arm": label, "final_train_loss": round(final_loss, 5),
                **{f"eval_{k}": v for k, v in em.items()}}

    def _iid(rng):
        while True:
            yield rng.integers(0, 512, (batch,))

    rows = []
    # iid baseline: exactly exp_convergence's protocol (same seeds)
    rows.append(train_with_stream("iid", _iid(np.random.default_rng(0))))
    print(json.dumps(rows[-1]), flush=True)
    for e in echoes:
        rng = np.random.default_rng(0)
        rows.append(train_with_stream(
            f"window{window}_echo{e}",
            _echo_indices(512, window, e, batch, rng)))
        print(json.dumps(rows[-1]), flush=True)

    rec = {"benchmark": "echo_quality", "model": cfg.model.name,
           "steps": steps, "batch": batch, "window": window,
           "backend": jax.default_backend(), "rows": rows}
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["steps"] = int(sys.argv[1])
    run(**kw)
