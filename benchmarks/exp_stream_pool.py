"""Rotating-window pool + data echoing: the throughput ladder.

Question: for a dataset LARGER than the device-cache budget, what train
rate does the rotating-window pool (`--cache-window-mb`) sustain, and how
does the data-echo factor (`--window-epochs E`) move it?

Model: with `t_stage` = one window's staging time (link-bound) and
`t_train` = one shard-local pass over the window (device-bound), the
pipeline sustains `E * win_imgs / max(t_stage, E * t_train)` — linear in E
while the link binds, saturating at the device rate once `E * t_train`
covers `t_stage`. The ladder measures exactly that curve on this
environment's link; on a locally-attached host the same curve applies
with a ~100x faster link (smaller E saturates).

Protocol: pack a raw-Make3D-shape synthetic dataset to records (the real
`prepare` path; memmap reads at ~6.6 GB/s are never the binding term),
then drive StreamingPoolSampler -> fused train_step (the loop.train
composition, per-step async dispatch) for 1 warmup window + `timed`
windows per arm. The timed span includes the staging stalls of every
window it consumes — the number is the sustained rate, not a burst.

Comparison rows (results.jsonl):
  host_fed_feed e2e      — per-batch DeviceFeed on the same link
  scan_dispatch_ladder   — the device-rate ceiling (full resident pool)
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")


def run(n_examples=1024, window_mb=128, echoes=(1, 8, 32, 128),
        timed_windows=4, batch_size=16):
    import jax

    from bench_feed import _SynthLoader
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.records import RecordDataset, pack
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.parallel import mesh as meshlib
    from ann3depth_tpu.pipeline.streaming_pool import StreamingPoolSampler
    from ann3depth_tpu.train import loop as looplib
    from ann3depth_tpu.train import step as steplib

    cfg = get_config("make3d-encdec")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=batch_size))

    tmp = tempfile.mkdtemp(prefix="streampool_")
    try:
        print(f"packing {n_examples} raw-shape examples to records ...",
              flush=True)
        index = pack(_SynthLoader(n_examples), tmp, "train", shard_size=256)
        ds = RecordDataset(index)
        ex_mb = (ds[0][0].nbytes + ds[0][1].nbytes) / 1e6

        mesh = meshlib.create_mesh()
        rng = jax.device_put(jax.random.key(0), meshlib.replicated(mesh))
        kw = dict(input_hw=cfg.data.input_hw,
                  target_hw=looplib.resolved_target_hw(cfg),
                  si_lambda=cfg.train.si_lambda, augment=True,
                  use_pallas=False,
                  emit_s2d=registry.s2d_input_factor(cfg.model.name),
                  grad_accum=1, ema_decay=0.0)

        ex_bytes = ds[0][0].nbytes + ds[0][1].nbytes
        win = ((window_mb << 20) // ex_bytes) // batch_size * batch_size
        n_data = mesh.shape.get("data", 1)
        rows = []
        for e in echoes:
            spw = (win // n_data) // (batch_size // n_data) * e
            sampler = StreamingPoolSampler(
                ds, batch_size, mesh, window_bytes=window_mb << 20,
                window_epochs=e, steps=(1 + timed_windows) * spw, seed=0)
            assert sampler.steps_per_window == spw and sampler.win == win
            total = (1 + timed_windows) * spw
            # fresh state per arm: train_step donates its buffers, so a
            # shared state0 would be dead after the first arm
            state = looplib.create_state(cfg, mesh)
            metrics, t0, n_timed = {}, None, 0
            t_start = time.perf_counter()
            for i, (img, dep) in enumerate(sampler):
                if i == spw:  # window 1 (incl. compile) = warmup
                    float(jax.device_get(metrics["loss"]))
                    t0 = time.perf_counter()
                state, metrics = steplib.train_step(state, img, dep, rng,
                                                    **kw)
                if t0 is not None:
                    n_timed += 1
            loss = float(jax.device_get(metrics["loss"]))
            dt = time.perf_counter() - t0
            sampler.close()
            assert n_timed == timed_windows * spw, (n_timed, total)
            row = {
                "window_epochs": e,
                "images_per_sec": round(batch_size * n_timed / dt, 1),
                "steps_per_window": spw,
                "window_examples": sampler.win,
                "timed_windows": timed_windows,
                "wall_s": round(time.perf_counter() - t_start, 1),
                "final_loss": round(loss, 4),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

        rec = {
            "benchmark": "stream_pool_echo_ladder",
            "model": cfg.model.name,
            "batch_size": batch_size,
            "window_mb": window_mb,
            "example_mb": round(ex_mb, 3),
            "n_examples": n_examples,
            "backend": jax.default_backend(),
            "rows": rows,
        }
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))
        return rec
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["echoes"] = tuple(int(x) for x in sys.argv[1].split(","))
    run(**kw)
