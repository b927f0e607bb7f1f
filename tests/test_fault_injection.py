"""Fault injection (SURVEY §5 "Failure detection / elastic recovery"):
SIGKILL the trainer mid-run, assert the next run resumes cleanly from the
last durable checkpoint and completes the remaining steps."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

_CHILD = """
import sys
from ann3depth_tpu.cli import main
sys.exit(main([
    "train", "--config", "smoke", "--steps", "200", "--batch-size", "8",
    "--ckpt-dir", sys.argv[1], "--workdir", sys.argv[2],
]))
"""


@pytest.mark.slow
def test_kill_midrun_then_resume(tmp_path):
    ckpt_dir, workdir = str(tmp_path / "ckpt"), str(tmp_path / "wd")
    from conftest import cpu_child_env
    env = cpu_child_env()
    child = subprocess.Popen(
        [sys.executable, "-c", _CHILD, ckpt_dir, workdir],
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    # wait until at least one checkpoint exists (smoke saves every 5 steps),
    # then kill hard mid-run. The 0.1 s poll vs the child's CPU-lockstep
    # ~0.4 s/step (train/loop.py cpu_lockstep) keeps the kill well inside
    # the run; 200 steps bounds the resume leg's wall clock.
    deadline = time.time() + 600
    ckpt_seen = False
    while time.time() < deadline:
        if child.poll() is not None:
            pytest.fail(
                f"child exited rc={child.returncode} before kill — "
                "crash (check by running _CHILD manually) or raise steps")
        if os.path.isdir(ckpt_dir) and any(
                d.isdigit() for d in os.listdir(ckpt_dir)):
            ckpt_seen = True
            break
        time.sleep(0.1)
    assert ckpt_seen, "no checkpoint appeared within deadline"
    child.send_signal(signal.SIGKILL)
    child.wait(timeout=30)

    # resume in-process: must restore and run through to step 200.
    import dataclasses

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import loop as looplib
    from ann3depth_tpu.train.checkpoint import CheckpointManager

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, steps=200, batch_size=8, resume=True,
            ckpt_dir=ckpt_dir, checkpoint_every=100, log_every=100))
    state, metrics = looplib.train(cfg, workdir=workdir, progress=False)
    assert int(state.step) == 200

    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == 200
    mgr.close()
