"""Sweep per-compile XLA:TPU compiler options on the headline train step.

Every algorithmic/layout lever on the b16 encdec step has been measured
and closed (docs/design.md §2b-2d); the one axis never tried is the
compiler's own tuning surface. jax exposes it per-compile
(`lowered.compile(compiler_options=...)` / `jax.jit(compiler_options=...)`),
and this environment's remote-compile relay honors it (probed: all the
option names below are accepted).

Arms are compiled from ONE lowering of the production scan-of-K train
step (identical HLO in, only compiler options vary), timed with the
device_get sync discipline. Options probed:

- `xla_tpu_scoped_vmem_limit_kib`: ceiling for scoped (fusion) VMEM; a
  higher limit lets bigger fusions stay on-chip, the classic first knob
  for conv workloads.
- `xla_tpu_enable_experimental_fusion_cost_model`: alternate fusion
  decisions.
- `xla_tpu_licm_size_inflation_ratio`: loop-invariant code motion
  aggressiveness inside the scan body.
- `xla_tpu_{vector_load,vector_store}_fusion_window`: VPU load/store
  fusion horizon (the step has ~180 us of layout copies, §2b).
- `xla_tpu_dot_dot_fusion_duplicated`: fuse chained dots even when it
  duplicates work (the preprocess is two chained resize matmuls).

Run: python -m benchmarks.exp_xla_flags [batch ...]   (default: 16)
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
RAW_HW = (480, 640)
K = 20

ARMS = [
    ("baseline", {}),
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": 32768}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": 65536}),
    ("vmem96m", {"xla_tpu_scoped_vmem_limit_kib": 98304}),
    ("fusion_cost_model",
     {"xla_tpu_enable_experimental_fusion_cost_model": True}),
    ("licm4", {"xla_tpu_licm_size_inflation_ratio": 4.0}),
    ("vec_window_2x", {"xla_tpu_vector_load_fusion_window": 2048,
                       "xla_tpu_vector_store_fusion_window": 512}),
    ("dot_dot_dup", {"xla_tpu_dot_dot_fusion_duplicated": True}),
]

# The first sweep's winners, re-measured interleaved (drift-proof) and
# composed: python -m benchmarks.exp_xla_flags --finals 16
FINAL_ARMS = [
    ("baseline", {}),
    ("fusion_cost_model",
     {"xla_tpu_enable_experimental_fusion_cost_model": True}),
    ("licm4", {"xla_tpu_licm_size_inflation_ratio": 4.0}),
    ("vec_window_2x", {"xla_tpu_vector_load_fusion_window": 2048,
                       "xla_tpu_vector_store_fusion_window": 512}),
    ("combo", {"xla_tpu_enable_experimental_fusion_cost_model": True,
               "xla_tpu_licm_size_inflation_ratio": 4.0,
               "xla_tpu_vector_load_fusion_window": 2048,
               "xla_tpu_vector_store_fusion_window": 512}),
]


def _sync(x):
    return float(jax.device_get(x))


def sweep(batch=16, record=True, arms=ARMS, rounds=5):
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.parallel import mesh as meshlib
    from ann3depth_tpu.train import loop as looplib
    from ann3depth_tpu.train import step as steplib

    import dataclasses

    cfg = get_config("make3d-encdec")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=batch))
    mesh = meshlib.create_mesh()
    state = looplib.create_state(cfg, mesh)
    rng = jax.device_put(jax.random.key(0), meshlib.replicated(mesh))

    from jax.sharding import NamedSharding, PartitionSpec as P

    rng_np = np.random.default_rng(0)
    pool_sharding = NamedSharding(mesh, P(None, meshlib.DATA_AXIS))
    pool_img = jax.device_put(
        rng_np.integers(0, 256, (4, batch, *RAW_HW, 3), dtype=np.uint8),
        pool_sharding)
    pool_dep = jax.device_put(
        rng_np.uniform(1.0, 60.0, (4, batch, RAW_HW[0] // 10,
                                   RAW_HW[1] // 10)).astype(np.float32),
        pool_sharding)

    kw = dict(input_hw=cfg.data.input_hw,
              target_hw=looplib.resolved_target_hw(cfg),
              si_lambda=cfg.train.si_lambda, augment=True,
              use_pallas=False,
              emit_s2d=registry.s2d_input_factor(cfg.model.name),
              grad_accum=cfg.train.grad_accum,
              ema_decay=cfg.train.ema_decay)

    def run_k(st, pool_img, pool_dep):
        def one(st, i):
            im = jax.lax.dynamic_index_in_dim(pool_img, i % 4, 0,
                                              keepdims=False)
            de = jax.lax.dynamic_index_in_dim(pool_dep, i % 4, 0,
                                              keepdims=False)
            st, m = steplib.train_step.__wrapped__(st, im, de, rng, **kw)
            return st, m["loss"]

        return jax.lax.scan(one, st, jnp.arange(K))

    lowered = jax.jit(run_k).lower(state, pool_img, pool_dep)
    args = (state, pool_img, pool_dep)

    compiled_arms = []
    for name, opts in arms:
        try:
            compiled_arms.append(
                (name, opts, lowered.compile(compiler_options=opts or None)))
        except Exception as e:  # an arm the relay/compiler rejects
            print(f"{name:>20}: REJECTED ({str(e).splitlines()[0][:90]})")

    # Interleaved round-robin timing: device/tunnel speed drifts on the
    # scale of minutes here (NOTES.md: ±15% across a day), so sequential
    # per-arm timing can fake a win. Each round times every arm once;
    # per-arm medians over rounds cancel the drift.
    times: dict = {name: [] for name, _, _ in compiled_arms}
    for name, _, compiled in compiled_arms:  # warm each program once
        _sync(compiled(*args)[1][-1])
    for _ in range(rounds):
        for name, _, compiled in compiled_arms:
            t0 = time.perf_counter()
            for _ in range(2):
                out = compiled(*args)
            _sync(out[1][-1])
            times[name].append((time.perf_counter() - t0) / 2)

    rows = []
    base_ips = None
    for name, opts, _ in compiled_arms:
        dt = sorted(times[name])[len(times[name]) // 2]  # median round
        ips = batch * K / dt
        if base_ips is None:
            base_ips = ips
        spread = (max(times[name]) - min(times[name])) / dt * 100
        rows.append({"arm": name, "opts": opts, "ms_per_step": dt / K * 1e3,
                     "images_per_sec": round(ips, 1),
                     "round_spread_pct": round(spread, 2),
                     "vs_baseline_pct": round((ips / base_ips - 1) * 100, 2)})
        print(f"{name:>20}: {dt / K * 1e3:7.3f} ms/step  "
              f"{ips:8.1f} img/s  ({rows[-1]['vs_baseline_pct']:+.2f}%, "
              f"spread {spread:.1f}%)")

    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps({
                "bench": "xla_flags_encdec", "batch": batch, "scan_k": K,
                "rounds": rounds,
                "device": jax.devices()[0].device_kind,
                "rows": rows}) + "\n")
    return rows


if __name__ == "__main__":
    argv = sys.argv[1:]
    arms = ARMS
    if "--finals" in argv:
        argv.remove("--finals")
        arms = FINAL_ARMS
    batches = [int(a) for a in argv] or [16]
    for b in batches:
        print(f"== batch {b} ==")
        sweep(batch=b, arms=arms)
