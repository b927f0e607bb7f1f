"""NYU [B:9] quality pricing through the PRODUCT PATH (VERDICT r4
Missing #3 / Next #3: `nyu-encdec-aug` — one of the five binding BASELINE
configs, whose stated point is the fused augmentation pipeline — had only
smoke coverage; every quality row was Make3D-synthetic-shaped).

Arms train the REAL CLI (`python -m ann3depth_tpu train ...`) on the
true-scale NYU records (scene-correlated synthetic stand-in at authentic
dims/format — tools/synth_real_scale.py r5; packed by `prepare`), then
eval the full scene-disjoint test split with the real CLI:

  si          augmentation OFF (the ablation arm)
  si+aug      the binding nyu-encdec-aug config exactly
  si+grad+aug the measured Make3D quality lever, re-priced on NYU shapes

Each arm: 4000 steps b16 (the standard convergence budget),
--cache-device + --steps-per-dispatch 100 (the flagship loop shape), and
evals plain + --tta flip. Prerequisites: `make synth-data download-nyu`
and `prepare --dataset nyu` for both splits (or `make rehearsal`).

Run: python -m benchmarks.exp_nyu_product [steps] [--data-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

RESULTS = os.path.join(os.path.dirname(__file__), "results.jsonl")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARMS = [
    # (name, loss, augment)
    ("si", "si", False),
    ("si+aug", "si", True),          # == nyu-encdec-aug [B:9]
    ("si+grad+aug", "si+grad", True),
]


def _cli(args, log_path):
    """Run the real CLI as a subprocess (fresh process per invocation —
    the product path exactly; the persistent XLA compile cache makes
    repeat program builds cheap). Returns the last stdout line (the
    CLI's JSON result)."""
    cmd = [sys.executable, "-m", "ann3depth_tpu", *args]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    with open(log_path, "a") as log:
        log.write("\n$ " + " ".join(cmd) + "\n")
        log.flush()
        proc = subprocess.run(cmd, cwd=REPO, env=env,
                              stdout=subprocess.PIPE, stderr=log,
                              text=True, timeout=7200)
    for line in proc.stdout.splitlines():
        print(line, flush=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"CLI {' '.join(args[:2])} failed rc={proc.returncode}; "
            f"see {log_path}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def run(steps=4000, data_dir="data", workroot="/tmp/nyu_product",
        record=True):
    rows = []
    for name, loss, augment in ARMS:
        ckpt = os.path.join(workroot, name.replace("+", "_"), "ckpt")
        wd = os.path.join(workroot, name.replace("+", "_"), "wd")
        log = os.path.join(workroot, name.replace("+", "_") + ".log")
        os.makedirs(os.path.dirname(ckpt), exist_ok=True)
        t0 = time.perf_counter()
        train_args = ["train", "--config", "nyu-encdec-aug",
                      "--data-dir", data_dir, "--steps", str(steps),
                      "--loss", loss, "--cache-device",
                      "--steps-per-dispatch", "100",
                      "--log-every", "1000",
                      "--checkpoint-every", str(steps),
                      "--ckpt-dir", ckpt, "--workdir", wd]
        if augment:
            train_args.append("--augment")
        else:
            # nyu-encdec-aug has augment=True baked in; the ablation arm
            # trains the same preset with augmentation disabled.
            train_args += ["--no-augment"]
        tm = _cli(train_args, log)
        t_train = time.perf_counter() - t0

        evals = {}
        for tag, extra in (("plain", []), ("tta", ["--tta", "flip"]),
                           ("tta_crop", ["--tta", "flip", "--crop",
                                         "eigen"])):
            evals[tag] = _cli(
                ["eval", "--config", "nyu-encdec-aug", "--data-dir",
                 data_dir, "--cache-device", "--ckpt-dir", ckpt, *extra],
                log)
        row = {"arm": name, "loss": loss, "augment": augment,
               "steps": steps, "train_wall_s": round(t_train, 1),
               "final_train": tm, "eval": evals["plain"],
               "eval_tta": evals["tta"], "eval_tta_crop": evals["tta_crop"]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    rec = {"bench": "nyu_product_levers", "config": "nyu-encdec-aug",
           "steps": steps, "batch": 16, "data": "true-scale synth (r5 "
           "scene-correlated), scene-disjoint split", "rows": rows,
           "time": time.time()}
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("steps", nargs="?", type=int, default=4000)
    ap.add_argument("--data-dir", default="data")
    a = ap.parse_args()
    run(steps=a.steps, data_dir=a.data_dir)
