"""Multi-host (multi-process) DP training (parallel/multihost.py): two CPU
processes x 4 fake devices each form one 8-device global mesh with gloo
cross-process collectives; loop.train runs the standard jitted step over
it, each process feeding its strided dataset shard."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = """
import dataclasses, json, sys
from ann3depth_tpu.parallel import multihost
multihost.initialize(coordinator="127.0.0.1:" + sys.argv[2],
                     num_processes=2, process_id=int(sys.argv[1]))
import jax
from ann3depth_tpu.config import get_config
from ann3depth_tpu.train import loop

opts = json.loads(sys.argv[5]) if len(sys.argv) > 5 else {}
mode = opts.get("mode", "builtin")
cfg = get_config("smoke")
data = cfg.data
model = cfg.model
tp = 1
if mode == "cache":
    data = dataclasses.replace(data, cache_device=True)
elif mode == "cache_spd":
    # cache_device + scanned K-step dispatch across two controllers:
    # index_blocks assembles the [K, local] block via
    # make_array_from_process_local_data, run_block is one global jit.
    data = dataclasses.replace(data, cache_device=True)
elif mode == "stream":
    # rotating-window pool across two controllers: both draw the SAME
    # window permutation (shared seed), stage only their own devices'
    # shard of each window, echo locally
    data = dataclasses.replace(data, cache_device=True, cache_window_mb=1,
                               window_epochs=2)
elif mode == "grain":
    data = dataclasses.replace(data, use_grain=True)
elif mode == "multi":
    data = dataclasses.replace(data, datasets=("synthetic", "synthetic"))
elif mode == "tp":
    # dp(4) x tp(2) across the two processes; model axis intra-process
    data = dataclasses.replace(data, input_hw=(32, 32))
    model = dataclasses.replace(model, name="dpt-small",
                                compute_dtype="float32")
    tp = 2
cfg = dataclasses.replace(
    cfg,
    data=data,
    model=model,
    train=dataclasses.replace(
        cfg.train, batch_size=8,
        steps=opts.get("steps", 6),
        tensor_parallel=tp,
        ckpt_dir=sys.argv[3],
        checkpoint_every=opts.get("checkpoint_every", 5),
        resume=opts.get("resume", False),
        steps_per_dispatch=opts.get("steps_per_dispatch", 1),
        log_every=2, eval_every=opts.get("eval_every", 3)),
)
state, metrics = loop.train(cfg, workdir=sys.argv[4], progress=False)
from ann3depth_tpu.parallel.sharding_rules import describe_sharding
print("RESULT " + json.dumps({
    "proc": jax.process_index(),
    "nproc": jax.process_count(),
    "ndev": len(jax.devices()),
    "loss": float(metrics["loss"]),
    "step": int(state.step),
    "tp_sharded": any("model" in str(v)
                      for v in describe_sharding(state.params).values()),
}), flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn_two_process(tmp_path, mode, **opts):
    from conftest import cpu_child_env

    port = str(_free_port())
    ckpt = str(tmp_path / "ckpt")
    wds = [str(tmp_path / f"wd{i}") for i in (0, 1)]
    env = cpu_child_env(
        XLA_FLAGS="--xla_force_host_platform_device_count=4")
    cwd = os.path.dirname(os.path.dirname(__file__))
    blob = json.dumps({"mode": mode, **opts})
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), port, ckpt, wds[i],
             blob],
            env=env, cwd=cwd, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in (0, 1)
    ]
    return procs, wds, ckpt


def _run_two_process(tmp_path, mode, **opts):
    procs, wds, ckpt = _spawn_two_process(tmp_path, mode, **opts)
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out (collective deadlock?)")
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        outs.append(out)

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, f"no RESULT line in: {out!r}"
        r = json.loads(line[0][len("RESULT "):])
        results[r["proc"]] = r

    assert set(results) == {0, 1}
    for r in results.values():
        assert r["nproc"] == 2
        assert r["ndev"] == 8          # global mesh spans both processes
        assert r["step"] == opts.get("steps", 6)
        assert np.isfinite(r["loss"])
    # Params are replicated through the global psum: both controllers must
    # observe the identical final loss (bitwise — same program, same data).
    assert results[0]["loss"] == results[1]["loss"]
    return wds, ckpt, results


@pytest.mark.slow
def test_two_process_training_lockstep(tmp_path):
    wds, ckpt, _ = _run_two_process(tmp_path, "builtin")
    # Writers are process-0-only; checkpoints exist (both processes save
    # through orbax into the shared dir).
    assert os.path.exists(os.path.join(wds[0], "metrics.jsonl"))
    assert not os.path.exists(os.path.join(wds[1], "metrics.jsonl"))
    assert any(d.isdigit() for d in os.listdir(ckpt))


@pytest.mark.slow
def test_cluster_kill_then_resume(tmp_path):
    """Multi-host fault injection (SURVEY §5): SIGKILL the whole 2-process
    cluster mid-run (a dead host leaves the others stuck in collectives —
    restart is whole-job, the standard SPMD recovery model), then relaunch
    with resume: the cluster restores the shared orbax checkpoint and
    finishes the remaining steps in lockstep."""
    import signal
    import time

    procs, _, ckpt = _spawn_two_process(
        tmp_path, "builtin", steps=400, checkpoint_every=5, eval_every=0)
    deadline = time.time() + 600
    ckpt_seen = False
    while time.time() < deadline:
        if any(p.poll() is not None for p in procs):
            outs = [p.communicate() for p in procs if p.poll() is not None]
            pytest.fail(f"worker exited before kill: {outs}")
        if os.path.isdir(ckpt) and any(d.isdigit() for d in os.listdir(ckpt)):
            ckpt_seen = True
            break
        time.sleep(0.1)
    if not ckpt_seen:
        for p in procs:
            p.kill()
        pytest.fail("no checkpoint appeared within deadline")
    for p in procs:
        p.send_signal(signal.SIGKILL)
    for p in procs:
        p.wait(timeout=30)

    resumed_from = max(int(d) for d in os.listdir(ckpt) if d.isdigit())
    assert resumed_from >= 5
    # Fresh coordinator, same checkpoint dir: must continue, not restart.
    _run_two_process(tmp_path, "builtin", steps=resumed_from + 6,
                     resume=True, checkpoint_every=5, eval_every=0)
    final = max(int(d) for d in os.listdir(ckpt) if d.isdigit())
    assert final == resumed_from + 6


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["cache", "stream", "grain", "multi"])
def test_two_process_training_feed_paths(tmp_path, mode):
    """The r3-wired multi-host feed paths: HBM-resident device cache
    (per-process pool staging), the r4 rotating-window pool (shared
    window permutation, per-process shard staging + local echo), grain
    (per-process shard shuffling), and multi-dataset interleave (aligned
    source rotation) — each trains lockstep with bitwise-identical
    replicated losses."""
    _run_two_process(tmp_path, mode)


@pytest.mark.slow
def test_two_process_cache_device_scan_dispatch(tmp_path):
    """steps_per_dispatch under multi-host: each controller ships its
    [K, local] index block via make_array_from_process_local_data and
    dispatches the same global scanned program — losses stay bitwise
    identical across controllers, eval fires at block boundaries."""
    _run_two_process(tmp_path, "cache_spd", steps_per_dispatch=2,
                     checkpoint_every=6, eval_every=2)


@pytest.mark.slow
def test_two_process_tensor_parallel(tmp_path):
    """r3: dp(4) x tp(2) spanning two processes — TP params placed via
    make_array_from_callback (device_put cannot address remote shards),
    the model axis grouped within each process so its collectives never
    cross hosts, batches process-sharded over the data axis only. Both
    controllers train lockstep to bitwise-identical losses with the DPT
    q/k/v kernels actually sharded over "model"."""
    _, _, results = _run_two_process(tmp_path, "tp", steps=4,
                                     checkpoint_every=4, eval_every=0)
    assert all(r["tp_sharded"] for r in results.values())


def test_process_shard_view_partitions_everything_once():
    from ann3depth_tpu.data.batching import ProcessShardView

    class _DS:
        def __len__(self):
            return 11

        def __getitem__(self, i):
            assert 0 <= i < 11
            return i

    views = [ProcessShardView(_DS(), p, 3) for p in range(3)]
    assert [len(v) for v in views] == [4, 4, 3]
    seen = sorted(x for v in views for x in (v[i] for i in range(len(v))))
    assert seen == list(range(11))  # disjoint, complete


def test_process_shard_view_rejects_bad_index():
    from ann3depth_tpu.data.batching import ProcessShardView

    with pytest.raises(ValueError, match="process_index"):
        ProcessShardView([], 3, 3)
