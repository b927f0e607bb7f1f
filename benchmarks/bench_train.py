"""Training-throughput benchmark (BASELINE.md metrics: train images/sec).

Measures the steady-state fused train step for a Config on synthetic data
(device-resident batch pool: times the device pipeline, not host numpy).
Used by `python -m ann3depth_tpu bench` and by bench.py (the driver's
headline). Appends a JSONL record to benchmarks/results.jsonl.

Primary measurement: a scan-of-K program — K steps compiled into ONE
device program, so the number is the device pipeline's throughput. The
per-call dispatch path is reported alongside (`images_per_sec_dispatched`)
but is NOT the headline: this environment reaches the TPU through a
network tunnel whose per-dispatch RTT fluctuates by milliseconds
(observed 2.4 -> 5.4 ms/step across an afternoon with identical code),
and a locally-attached chip — the deployment target — does not have that
term. Real training overlaps dispatch with compute via the async feed.
"""

from __future__ import annotations

import functools
import json
import os
import time

RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")


def run(cfg, steps: int = 100, warmup: int = 10, raw_hw=(480, 640),
        record: bool = True) -> dict:
    import sys

    import jax
    import jax.numpy as jnp

    # Stage wall-clock marks (returned as result["stage_s"], and echoed
    # to stderr when BENCH_DEBUG is set): through the axon tunnel both
    # compile time and per-dispatch RTT fluctuate by orders of magnitude
    # across hours; when a bench run takes 8 minutes instead of 2 this
    # is how you tell which stage ate the time.
    t_start = time.perf_counter()
    stages = {}

    def mark(name):
        stages[name] = round(time.perf_counter() - t_start, 1)
        if os.environ.get("BENCH_DEBUG"):
            print(f"[bench_train +{stages[name]:7.1f}s] {name}",
                  file=sys.stderr, flush=True)

    from ann3depth_tpu.models import registry
    from ann3depth_tpu.parallel import mesh as meshlib
    from ann3depth_tpu.train import loop as looplib
    from ann3depth_tpu.train import step as steplib

    mesh = meshlib.create_mesh()
    state = looplib.create_state(cfg, mesh)
    rng = jax.device_put(jax.random.key(0), meshlib.replicated(mesh))

    from jax.sharding import NamedSharding, PartitionSpec as P

    b = cfg.train.batch_size
    # Synthetic pool generated ON DEVICE (r4): the old host-side numpy
    # pool shipped ~118 MB (4 + 1 stacked copies of b uint8 frames)
    # through the tunnel before measuring anything — on a degraded-link
    # day that made bench SETUP take 4-10 minutes (measured 227 s while
    # every timed stage summed to 7 s). Device-side RNG costs no H2D and
    # measures identically (it is synthetic data either way).
    # Stacked pool for the scan program: batch axis is dim 1.
    pool_sharding = NamedSharding(mesh, P(None, meshlib.DATA_AXIS))

    @functools.partial(jax.jit, out_shardings=pool_sharding)
    def _gen_pool(key):
        k1, k2 = jax.random.split(key)
        img = jax.random.randint(k1, (4, b, *raw_hw, 3), 0, 256,
                                 dtype=jnp.uint8)
        dep = jax.random.uniform(k2, (4, b, raw_hw[0] // 10,
                                      raw_hw[1] // 10),
                                 jnp.float32, 1.0, 60.0)
        return img, dep

    pool_img, pool_dep = _gen_pool(jax.random.key(17))
    # Per-entry views for the dispatched loop: slicing dim 0 of a
    # P(None, data)-sharded array yields P(data) — the batch sharding.
    pool = [(pool_img[i], pool_dep[i]) for i in range(pool_img.shape[0])]

    use_pallas = (cfg.data.preprocess_impl == "pallas"
                  and jax.default_backend() == "tpu")
    kw = dict(input_hw=cfg.data.input_hw,
              target_hw=looplib.resolved_target_hw(cfg),
              si_lambda=cfg.train.si_lambda, augment=True,
              use_pallas=use_pallas,
              emit_s2d=0 if use_pallas
              else registry.s2d_input_factor(cfg.model.name),
              grad_accum=cfg.train.grad_accum,
              ema_decay=cfg.train.ema_decay)

    # FLOPs of the compiled step from XLA's own cost analysis (MFU
    # numerator; benchmarks/flops.py). Lower() with the pre-warmup live
    # state — it only traces, nothing is donated/executed.
    from benchmarks import flops as flopslib

    img0, dep0 = pool[0]
    mark("setup_done")
    step_fl = flopslib.step_flops(steplib.train_step, state, img0, dep0,
                                  rng, **kw)
    mark("flops_done")

    # --- dispatched loop (secondary: includes per-call dispatch cost) ---
    # Capped at 100 steps regardless of `steps`: each iteration pays the
    # tunnel's per-dispatch RTT, which fluctuates from ~2 ms to ~1 s
    # across hours — at the headline's steps=400 a bad-weather day turns
    # this diagnostic into minutes of wall for a number that is not the
    # headline (the scan program below is).
    d_steps = min(steps, 100)
    for i in range(warmup):
        img, dep = pool[i % len(pool)]
        state, metrics = steplib.train_step(state, img, dep, rng, **kw)
    float(jax.device_get(metrics["loss"]))  # real sync (see utils/tracing)
    mark("dispatched_warm_done")

    t0 = time.perf_counter()
    for i in range(d_steps):
        img, dep = pool[i % len(pool)]
        state, metrics = steplib.train_step(state, img, dep, rng, **kw)
    loss = float(jax.device_get(metrics["loss"]))
    dt_dispatched = time.perf_counter() - t0
    mark("dispatched_done")

    # --- scan-of-K program (primary: device pipeline throughput) ---
    # Pools enter as jit ARGUMENTS: a closure-captured concrete array is
    # embedded in the HLO as a constant, bloating the (tunnel-shipped)
    # compile request — see bench_infer.py, which hit the tunnel's 413
    # limit at b128 before the same fix.
    n_pool = pool_img.shape[0]
    K = max(20, min(steps, 50))

    @jax.jit
    def run_k(st, pool_img, pool_dep):
        def one(st, i):
            im = jax.lax.dynamic_index_in_dim(pool_img, i % n_pool, 0,
                                              keepdims=False)
            de = jax.lax.dynamic_index_in_dim(pool_dep, i % n_pool, 0,
                                              keepdims=False)
            st, m = steplib.train_step.__wrapped__(st, im, de, rng, **kw)
            return st, m["loss"]

        return jax.lax.scan(one, st, jnp.arange(K))

    state2 = looplib.create_state(cfg, mesh)
    for _ in range(2):
        out = run_k(state2, pool_img, pool_dep)
        state2 = out[0]
    float(jax.device_get(out[1][-1]))
    mark("scan_warm_done")
    reps = max(1, steps // K)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run_k(state2, pool_img, pool_dep)
        state2 = out[0]
    loss_scan = float(jax.device_get(out[1][-1]))
    dt_scan = time.perf_counter() - t0
    mark("scan_done")
    scan_steps_total = reps * K

    result = {
        "bench": "train_throughput",
        "model": cfg.model.name,
        # quant mode distinguishes int8-qat pricing rows from the bf16
        # baseline history in results.jsonl
        "quant": cfg.model.quant,
        "batch_size": b,
        "input_hw": list(cfg.data.input_hw),
        "backend": jax.default_backend(),
        "n_devices": mesh.devices.size,
        "images_per_sec": round(b * scan_steps_total / dt_scan, 2),
        "step_ms": round(dt_scan / scan_steps_total * 1e3, 3),
        "images_per_sec_dispatched": round(b * d_steps / dt_dispatched, 2),
        "step_ms_dispatched": round(dt_dispatched / d_steps * 1e3, 3),
        "final_loss": loss if loss == loss else loss_scan,
        "stage_s": stages,
        "time": time.time(),
    }
    assert loss_scan == loss_scan, "NaN loss in scan benchmark"
    flopslib.attach_mfu(result, step_fl, scan_steps_total, dt_scan)
    if cfg.train.grad_accum > 1:
        # XLA cost analysis counts the microbatch scan body ONCE, so the
        # numerator misses (accum-1)/accum of the real FLOPs here.
        result["mfu_note"] = ("undercounted for grad_accum>1; "
                              "exp_grad_accum.py corrects from the accum=1 row")
    flopslib.attach_memory(result)
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(result) + "\n")
    return result


if __name__ == "__main__":
    from ann3depth_tpu.config import get_config

    print(json.dumps(run(get_config("make3d-encdec"))))
