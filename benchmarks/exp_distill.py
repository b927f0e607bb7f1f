"""Price knowledge distillation on the synthetic convergence protocol.

Question: with an identical step budget, does a student trained with
`--distill-from` a converged encdec-w2 teacher beat the same student
trained on ground truth alone? Two students are priced:

  a) `small` (the 3-conv live/cheap model [B:7]) — the classic
     compression target: can the teacher's dense log-depth supervision
     buy back quality the tiny capacity loses;
  b) base `encdec` — same family as the teacher at half width.

Protocol mirrors benchmarks/exp_convergence.py: 512-image synthetic pool
staged into HBM, batches gathered on device (one program per step), full
test-pool eval via global sufficient statistics. The teacher trains once
and both its eval and the students' evals are recorded; students train
with alpha in {0 (GT baseline), 0.5, 0.9} at the same budget/seed so the
only variable is the distillation term.

Run: python -m benchmarks.exp_distill [student] [steps]
     student in {small, encdec, both (default)}
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import numpy as np

from benchmarks.exp_convergence import (RESULTS, _device_pool, _eval_on_pool,
                                        _train_on_pool)

ALPHAS = (0.0, 0.5, 0.9)


@functools.partial(
    jax.jit, donate_argnames=("state",),
    static_argnames=("teacher_apply", "input_hw", "target_hw", "si_lambda",
                     "augment", "distill_alpha"))
def _pool_distill_step(state, teacher_params, pool_img, pool_dep, idx, rng,
                       *, teacher_apply, input_hw, target_hw, si_lambda,
                       augment, distill_alpha):
    """Gather a batch from the HBM pool and run the fused distill step."""
    from ann3depth_tpu.train import step as steplib

    img = pool_img[idx]
    dep = pool_dep[idx]
    return steplib.distill_train_step.__wrapped__(
        state, teacher_params, img, dep, rng, teacher_apply=teacher_apply,
        input_hw=input_hw, target_hw=target_hw, si_lambda=si_lambda,
        augment=augment, distill_alpha=distill_alpha)


def _train_student(student, teacher, teacher_params, cfg, pool, steps,
                   batch, alpha, target_hw, seed=0, log_every=500):
    from ann3depth_tpu.train import step as steplib

    input_hw = tuple(cfg.data.input_hw)
    params = steplib.init_params(student, input_hw, seed=seed)
    tx = steplib.make_optimizer(cfg.train.learning_rate,
                                cfg.train.warmup_steps, steps)
    state = steplib.TrainState.create(student.apply, params, tx)
    pool_img, pool_dep = pool
    n = pool_img.shape[0]
    rng = jax.random.key(seed)
    host_rng = np.random.default_rng(seed)

    t0 = time.perf_counter()
    for i in range(steps):
        idx = host_rng.integers(0, n, (batch,))
        state, metrics = _pool_distill_step(
            state, teacher_params, pool_img, pool_dep, idx, rng,
            teacher_apply=teacher.apply, input_hw=input_hw,
            target_hw=target_hw, si_lambda=cfg.train.si_lambda,
            augment=cfg.data.augment, distill_alpha=alpha)
        if (i + 1) % log_every == 0 or i == steps - 1:
            m = jax.device_get(metrics)
            print(f"  [alpha={alpha}] step {i+1}: loss={m['loss']:.4f} "
                  f"gt={m['gt_loss']:.4f} distill={m['distill']:.4f} "
                  f"rmse={m['rmse']:.3f} ({time.perf_counter()-t0:.0f}s)",
                  flush=True)
    return state


def run(student_names=("small", "encdec"), teacher_steps=4000,
        student_steps=3000, batch=16, record=True):
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.models.encdec import EncDecDepthNet

    cfg = get_config("make3d-encdec")
    train_ds = SyntheticDepthDataset(n=512, img_hw=(360, 480),
                                     depth_hw=(180, 240), seed=0)
    test_ds = SyntheticDepthDataset(n=64, img_hw=(360, 480),
                                    depth_hw=(180, 240), seed=1)
    print(f"staging pools ({len(train_ds)} train / {len(test_ds)} test)...",
          flush=True)
    pool = _device_pool(train_ds)
    pool_test = _device_pool(test_ds)

    teacher = EncDecDepthNet(width_mult=2.0)
    print(f"training encdec-w2 teacher for {teacher_steps} steps...",
          flush=True)
    tstate, _ = _train_on_pool(teacher, cfg, pool, teacher_steps, batch,
                               emit_s2d=EncDecDepthNet.S2D_INPUT_FACTOR)
    teacher_hw = EncDecDepthNet.output_hw(cfg.data.input_hw)
    teacher_eval = _eval_on_pool(teacher.apply, tstate.params, cfg,
                                 pool_test, batch, teacher_hw)
    print(f"teacher eval: {teacher_eval['rmse']=}", flush=True)

    results = {"teacher_eval": teacher_eval}
    for name in student_names:
        mcfg = get_config("smoke").model
        import dataclasses as _dc
        student = registry.build(_dc.replace(
            mcfg, name=name,
            compute_dtype="float32" if name == "small" else "bfloat16"))
        target_hw = registry.output_hw(name, cfg.data.input_hw)
        per_alpha = {}
        for alpha in ALPHAS:
            print(f"training student {name} alpha={alpha} for "
                  f"{student_steps} steps...", flush=True)
            sstate = _train_student(student, teacher, tstate.params, cfg,
                                    pool, student_steps, batch, alpha,
                                    target_hw)
            ev = _eval_on_pool(student.apply, sstate.params, cfg, pool_test,
                               batch, target_hw)
            per_alpha[alpha] = ev
            print(f"  student {name} alpha={alpha}: rmse={ev['rmse']}",
                  flush=True)
        base = per_alpha[0.0]["rmse"]
        results[name] = {
            "per_alpha": {str(a): e for a, e in per_alpha.items()},
            "best_alpha": min(per_alpha, key=lambda a: per_alpha[a]["rmse"]),
            "rmse_delta_pct": {
                str(a): round(100 * (per_alpha[a]["rmse"] / base - 1), 2)
                for a in ALPHAS if a != 0.0},
        }

    out = {
        "bench": "distill",
        "teacher_steps": teacher_steps, "student_steps": student_steps,
        "batch": batch, "backend": jax.default_backend(),
        **results,
        "time": time.time(),
    }
    if record:
        with open(RESULTS, "a") as f:
            f.write(json.dumps(out) + "\n")
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    names = {"both": ("small", "encdec"), "small": ("small",),
             "encdec": ("encdec",)}[which]
    run(student_names=names, student_steps=steps)
