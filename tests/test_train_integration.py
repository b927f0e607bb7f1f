"""Integration tests (SURVEY.md §4.4): short train runs, loss decreases,
checkpoint round-trip + resume, eval loop."""

import dataclasses
import json
import os

import numpy as np
import pytest

from ann3depth_tpu.config import get_config
from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
from ann3depth_tpu.train import loop as looplib


def _smoke_cfg(tmp_path, **train_overrides):
    cfg = get_config("smoke")
    train = dataclasses.replace(
        cfg.train, ckpt_dir=str(tmp_path / "ckpt"), **train_overrides)
    data = dataclasses.replace(cfg.data, input_hw=(48, 64))
    return dataclasses.replace(cfg, train=train, data=data)


@pytest.mark.slow
def test_train_loss_decreases(tmp_path):
    cfg = _smoke_cfg(tmp_path, steps=60, batch_size=4, learning_rate=3e-3,
                     log_every=10, checkpoint_every=1000, warmup_steps=0)
    state, metrics = looplib.train(cfg, workdir=str(tmp_path), progress=False)
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    losses = [l["loss"] for l in lines]
    assert losses[-1] < losses[0] * 0.7, losses
    assert np.isfinite(losses[-1])


def test_checkpoint_resume_continues_step_counter(tmp_path):
    cfg = _smoke_cfg(tmp_path, steps=10, batch_size=2, checkpoint_every=5,
                     log_every=5, warmup_steps=0)
    state, _ = looplib.train(cfg, workdir=str(tmp_path), progress=False)
    assert int(state.step) == 10

    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, steps=15, resume=True))
    state2, _ = looplib.train(cfg2, workdir=str(tmp_path), progress=False)
    assert int(state2.step) == 15


def test_resume_of_finished_run_is_noop(tmp_path):
    """Resuming at steps == configured total must not run extra steps."""
    cfg = _smoke_cfg(tmp_path, steps=6, batch_size=2, checkpoint_every=3,
                     log_every=100, warmup_steps=0)
    state, _ = looplib.train(cfg, workdir=str(tmp_path), progress=False)
    assert int(state.step) == 6
    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resume=True))
    state2, _ = looplib.train(cfg2, workdir=str(tmp_path), progress=False)
    assert int(state2.step) == 6  # no overshoot


def test_batch_size_larger_than_dataset_raises():
    from ann3depth_tpu.data.synthetic import SyntheticDepthDataset

    ds = SyntheticDepthDataset(n=3, img_hw=(8, 8), depth_hw=(4, 4))
    with pytest.raises(ValueError, match="batch_size"):
        next(ds.batches(8, steps=1))


def test_resume_reproduces_params(tmp_path):
    """Killing the trainer and resuming must restore identical params
    (fault-injection surface, SURVEY §5 'Failure detection')."""
    import jax
    cfg = _smoke_cfg(tmp_path, steps=6, batch_size=2, checkpoint_every=3,
                     log_every=100, warmup_steps=0)
    state, _ = looplib.train(cfg, workdir=str(tmp_path), progress=False)

    # fresh process-equivalent: new state restored from disk
    state2 = looplib.create_state(cfg)
    from ann3depth_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(cfg.train.ckpt_dir)
    state2, step = mgr.restore(state2)
    mgr.close()
    assert step == 6
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_loop_runs(tmp_path):
    cfg = _smoke_cfg(tmp_path, steps=4, batch_size=2, checkpoint_every=4,
                     log_every=100, warmup_steps=0)
    state, _ = looplib.train(cfg, workdir=str(tmp_path), progress=False)
    metrics = looplib.evaluate(cfg, state=state,
                               dataset=SyntheticDepthDataset(n=8, seed=9),
                               max_batches=2)
    for k in ("rmse", "abs_rel", "delta1", "loss"):
        assert k in metrics and np.isfinite(metrics[k])


def test_train_halts_on_nonfinite_loss(tmp_path):
    """Divergence guard (SURVEY §5 failure detection): a blown-up run must
    halt with a clear error at the next log point, not spin on NaNs."""
    cfg = _smoke_cfg(tmp_path, steps=40, batch_size=2, log_every=5,
                     checkpoint_every=1000, warmup_steps=0,
                     learning_rate=1e18)  # guaranteed blow-up
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        looplib.train(cfg, workdir=str(tmp_path), progress=False)


def test_multi_dataset_training_interleaves(tmp_path):
    """cfg.data.datasets with >1 entry trains over all of them,
    batch-interleaved (the reference CLI's dataset-list surface)."""
    cfg = _smoke_cfg(tmp_path, steps=4, batch_size=2, checkpoint_every=100,
                     log_every=2, warmup_steps=0)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(
            cfg.data, datasets=("synthetic", "synthetic")))
    state, metrics = looplib.train(cfg, workdir=str(tmp_path), progress=False)
    assert int(state.step) == 4
    assert np.isfinite(metrics["loss"])


@pytest.mark.slow
def test_cli_ckpt_step_pins_the_scored_checkpoint(tmp_path, capsys):
    """eval --ckpt-step N scores checkpoint N, not the latest — the two
    steps' metrics differ because training moved the params."""
    from ann3depth_tpu.cli import main

    ckpt = str(tmp_path / "c")
    rc = main(["train", "--config", "smoke", "--steps", "6",
               "--batch-size", "2", "--ckpt-dir", ckpt,
               "--workdir", str(tmp_path / "w")])
    assert rc == 0  # smoke preset checkpoints every 5 -> steps 5 and 6
    out = []
    for extra in ([], ["--ckpt-step", "5"]):
        rc = main(["eval", "--config", "smoke", "--batch-size", "2",
                   "--ckpt-dir", ckpt, "--max-batches", "1", *extra])
        assert rc == 0
        out.append(json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]))
    assert out[0]["rmse"] != out[1]["rmse"]

    with pytest.raises(ValueError, match="no checkpoint at step 3"):
        main(["eval", "--config", "smoke", "--batch-size", "2",
              "--ckpt-dir", ckpt, "--ckpt-step", "3"])
    with pytest.raises(SystemExit, match="resume-step"):
        main(["train", "--config", "smoke", "--ckpt-dir", ckpt,
              "--ckpt-step", "5"])


def test_resume_step_rolls_back(tmp_path):
    """--resume-step N: restore checkpoint N (not latest), delete the
    abandoned newer ones, continue the counter from N."""
    import dataclasses
    import os

    import pytest

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    def cfg_with(**kw):
        cfg = get_config("smoke")
        return dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, batch_size=2, eval_every=0, log_every=100,
                checkpoint_every=2, ckpt_dir=str(tmp_path / "ckpt"), **kw))

    looplib.train(cfg_with(steps=6), workdir=str(tmp_path), progress=False)
    assert sorted(os.listdir(tmp_path / "ckpt")) == ["2", "4", "6"]

    state, _ = looplib.train(cfg_with(steps=8, resume_step=4),
                             workdir=str(tmp_path), progress=False)
    assert int(state.step) == 8
    # 6 was deleted at rollback; the continued timeline re-saved 6 and 8
    assert sorted(os.listdir(tmp_path / "ckpt")) == ["4", "6", "8"]

    with pytest.raises(ValueError, match="no checkpoint at step 5"):
        looplib.train(cfg_with(steps=8, resume_step=5),
                      workdir=str(tmp_path), progress=False)


def test_training_is_bitwise_deterministic(tmp_path):
    """Two runs with the same seed produce the SAME final loss and
    params bit for bit (seeded init + seeded data order + deterministic
    XLA program). The property real sweeps and bisections rely on."""
    import dataclasses

    import jax

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    def run(tag):
        cfg = get_config("smoke")
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, steps=4, batch_size=2, eval_every=0,
                log_every=10, checkpoint_every=100,
                ckpt_dir=str(tmp_path / tag / "ckpt")))
        return looplib.train(cfg, workdir=str(tmp_path / tag),
                             progress=False)

    s1, m1 = run("a")
    s2, m2 = run("b")
    assert float(m1["loss"]) == float(m2["loss"])
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_stopping_halts_on_stale_eval(tmp_path):
    """patience=1 with an unreachable min_delta: the first in-loop eval
    sets the best, the second is 'stale' -> training stops at step 2 of
    10 and the stop-step checkpoint is durable."""
    import dataclasses
    import os

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, steps=10, batch_size=2, eval_every=1,
            early_stop_patience=1, early_stop_min_delta=1e9,
            checkpoint_every=100, log_every=100,
            ckpt_dir=str(tmp_path / "ckpt")))
    state, metrics = looplib.train(cfg, workdir=str(tmp_path),
                                   progress=False)
    assert int(state.step) == 2
    assert "2" in os.listdir(cfg.train.ckpt_dir)


def test_early_stopping_restores_best_weights(tmp_path):
    """The stop-step checkpoint carries the BEST-eval params (Keras
    restore_best_weights semantics), not the stale weights the stop was
    triggered on: with an unreachable min_delta the best is the step-1
    eval, so checkpoint '2' (the stop save) must equal checkpoint '1'."""
    import dataclasses

    import jax

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib
    from ann3depth_tpu.train.checkpoint import CheckpointManager

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, steps=10, batch_size=2, eval_every=1,
            early_stop_patience=1, early_stop_min_delta=1e9,
            checkpoint_every=1, log_every=100,
            ckpt_dir=str(tmp_path / "ckpt")))
    state, _ = looplib.train(cfg, workdir=str(tmp_path), progress=False)
    assert int(state.step) == 2

    template = looplib.create_state(cfg)
    ckpt = CheckpointManager(cfg.train.ckpt_dir)
    best, s1 = ckpt.restore_params(template, step=1)
    stop, s2 = ckpt.restore_params(template, step=2)
    ckpt.close()
    assert (s1, s2) == (1, 2)
    for a, b in zip(jax.tree.leaves(best.params),
                    jax.tree.leaves(stop.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_stop_requires_in_loop_eval(tmp_path):
    import dataclasses

    import pytest

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")  # smoke preset has eval_every=0
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, early_stop_patience=2))
    with pytest.raises(ValueError, match="eval_every"):
        looplib.train(cfg, workdir=str(tmp_path))


def test_cli_early_stop_flags_resolve():
    from ann3depth_tpu.cli import build_parser, _resolve

    args = build_parser().parse_args(
        ["train", "--config", "smoke", "--eval-every", "3",
         "--early-stop-patience", "2", "--early-stop-min-delta", "0.01"])
    cfg = _resolve(args)
    assert cfg.train.eval_every == 3
    assert cfg.train.early_stop_patience == 2
    assert cfg.train.early_stop_min_delta == 0.01


def test_cli_infer_writes_depth_files(tmp_path, capsys):
    from PIL import Image

    from ann3depth_tpu.cli import main

    rc = main(["train", "--config", "smoke", "--steps", "4",
               "--batch-size", "2", "--ckpt-dir", str(tmp_path / "c"),
               "--workdir", str(tmp_path)])
    assert rc == 0
    capsys.readouterr()
    img = np.random.default_rng(0).integers(0, 256, (60, 80, 3), np.uint8)
    Image.fromarray(img).save(tmp_path / "frame.jpg")
    rc = main(["infer", "--config", "smoke", "--ckpt-dir",
               str(tmp_path / "c"), "--image", str(tmp_path / "frame.jpg"),
               "--out-dir", str(tmp_path / "out"), "--ply"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out) == 1
    depth = np.load(out[0]["depth_npy"])
    assert depth.ndim == 2 and np.isfinite(depth).all() and (depth > 0).all()
    import os
    assert os.path.exists(out[0]["depth_png"])
    # --ply: colored point cloud, one point per (valid) depth pixel
    from ann3depth_tpu.utils import pointcloud
    pts, colors = pointcloud.read_ply(out[0]["ply"])
    assert out[0]["ply_points"] == pts.shape[0] == depth.size
    assert colors.shape == (depth.size, 3)
    np.testing.assert_allclose(np.sort(pts[:, 2]), np.sort(depth.ravel()),
                               rtol=1e-6)


def test_cli_train_smoke(tmp_path, capsys):
    from ann3depth_tpu.cli import main
    rc = main(["train", "--config", "smoke", "--steps", "5",
               "--batch-size", "2", "--ckpt-dir", str(tmp_path / "c"),
               "--workdir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert "loss" in metrics


def test_profile_window_emits_trace(tmp_path):
    """--profile: a steady-state window of train steps lands in a
    jax.profiler trace directory (SURVEY §5 tracing)."""
    import glob

    cfg = _smoke_cfg(tmp_path, steps=8, batch_size=2, checkpoint_every=100,
                     log_every=100, warmup_steps=0,
                     profile_dir=str(tmp_path / "trace"), profile_steps=2)
    looplib.train(cfg, workdir=str(tmp_path), progress=False)
    files = glob.glob(str(tmp_path / "trace" / "**" / "*"), recursive=True)
    assert any(f.endswith(".pb") or "trace" in os.path.basename(f)
               or "xplane" in f for f in files), files


def test_warmup_zero_keeps_cosine_decay():
    """--warmup-steps 0 must disable only the warmup, not the whole
    schedule (review r3: the old falsy check fell back to a constant lr)."""
    from ann3depth_tpu.train import step as steplib

    sched = steplib.make_schedule(1e-3, warmup_steps=0, total_steps=1000)
    assert callable(sched)
    assert float(sched(0)) == pytest.approx(1e-3, rel=1e-6)  # no warmup
    assert float(sched(999)) < 1e-4                          # cosine decayed
    # no total_steps -> constant lr (tests/benches)
    assert steplib.make_schedule(1e-3) == 1e-3


def test_clip_norm_nonpositive_disables_clipping():
    """--clip-norm 0 means 'no clipping', not 'zero every update' (review
    r3: optax.clip_by_global_norm(0.0) silently freezes training)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ann3depth_tpu.train import step as steplib

    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 100.0)}  # far beyond any clip threshold
    tx = steplib.make_optimizer(1e-2, clip_norm=0.0)
    updates, _ = tx.update(grads, tx.init(params), params)
    new = optax.apply_updates(params, updates)
    delta = float(jnp.max(jnp.abs(new["w"] - params["w"])))
    assert delta > 1e-4, "clip_norm=0 zeroed the update (frozen training)"

    # sanity: a positive clip still clips (same grads, tiny threshold)
    tx_c = steplib.make_optimizer(1e-2, clip_norm=1e-6)
    upd_c, _ = tx_c.update(grads, tx_c.init(params), params)
    assert jax.tree.leaves(upd_c)[0].shape == (4,)


def test_save_best_keeps_best_eval_checkpoint(tmp_path):
    """--save-best retains a one-slot checkpoint of the best in-loop eval
    and pins its score in best_metric.json (min of the eval_rmse log)."""
    import dataclasses
    import json
    import os

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib
    from ann3depth_tpu.train.checkpoint import CheckpointManager

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, steps=6, batch_size=2, eval_every=2,
            save_best=True, checkpoint_every=6, log_every=100,
            learning_rate=3e-3, ckpt_dir=str(tmp_path / "ckpt")))
    looplib.train(cfg, workdir=str(tmp_path), progress=False)

    mpath = tmp_path / "ckpt" / "best_metric.json"
    assert mpath.exists()
    with open(mpath) as f:
        best = json.load(f)

    evals = []
    with open(tmp_path / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "eval_rmse" in rec:
                evals.append((rec["step"], rec["eval_rmse"]))
    assert evals, "no in-loop evals were logged"
    min_step, min_rmse = min(evals, key=lambda e: e[1])
    assert best["step"] == min_step
    assert abs(best["rmse"] - min_rmse) < 1e-9

    best_dir = str(tmp_path / "ckpt" / "best")
    ckpt = CheckpointManager(best_dir)
    try:
        assert ckpt.all_steps() == [best["step"]]  # one retained slot
        template = looplib.create_state(cfg)
        _, step = ckpt.restore_params(template)
        assert step == best["step"]
    finally:
        ckpt.close()


def test_save_best_respects_prior_metric_on_resume(tmp_path):
    """A run resumed against an unbeatable recorded best never overwrites
    the best slot (the crash-survival guard)."""
    import dataclasses
    import json
    import os

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    ckpt_dir = tmp_path / "ckpt"
    os.makedirs(ckpt_dir)
    with open(ckpt_dir / "best_metric.json", "w") as f:
        json.dump({"rmse": 0.0, "step": 999}, f)

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, steps=4, batch_size=2, eval_every=2,
            save_best=True, checkpoint_every=4, log_every=100,
            ckpt_dir=str(ckpt_dir)))
    looplib.train(cfg, workdir=str(tmp_path), progress=False)

    with open(ckpt_dir / "best_metric.json") as f:
        assert json.load(f) == {"rmse": 0.0, "step": 999}  # untouched
    best_steps = [d for d in os.listdir(ckpt_dir / "best")
                  if d.isdigit()] if (ckpt_dir / "best").exists() else []
    assert best_steps == []


def test_save_best_requires_in_loop_eval(tmp_path):
    import dataclasses

    import pytest

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, steps=2, batch_size=2, eval_every=0, save_best=True,
            ckpt_dir=str(tmp_path / "ckpt")))
    with pytest.raises(ValueError, match="save_best"):
        looplib.train(cfg, workdir=str(tmp_path), progress=False)


def test_cadence_zero_disables_periodic(tmp_path):
    """log_every=0 / checkpoint_every=0 disable the periodic cadence (the
    natural 'off' spelling, matching eval_every=0); the final step still
    logs and saves, so downstream eval/infer have a checkpoint."""
    cfg = _smoke_cfg(tmp_path, steps=4, batch_size=2, log_every=0,
                     checkpoint_every=0, eval_every=0, warmup_steps=0)
    state, _ = looplib.train(cfg, workdir=str(tmp_path), progress=False)
    assert int(state.step) == 4
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert [l["step"] for l in lines] == [4]  # only the final step logged
    from ann3depth_tpu.train.checkpoint import CheckpointManager
    ckpt = CheckpointManager(cfg.train.ckpt_dir)
    try:
        assert ckpt.latest_step() == 4
    finally:
        ckpt.close()


def test_negative_cadence_rejected(tmp_path):
    cfg = _smoke_cfg(tmp_path, steps=4, batch_size=2, log_every=-1)
    with pytest.raises(ValueError, match="log_every"):
        looplib.train(cfg, workdir=str(tmp_path), progress=False)
