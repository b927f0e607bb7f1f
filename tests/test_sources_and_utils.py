"""Coverage for OpenCVSource (video file path), tracing utils, TB writer."""

import os

import numpy as np
import pytest


@pytest.fixture()
def tiny_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    if not w.isOpened():
        pytest.skip("no MJPG encoder available")
    for i in range(8):
        frame = np.full((48, 64, 3), i * 30, np.uint8)
        w.write(frame)
    w.release()
    return path


def test_opencv_source_reads_video(tiny_video):
    from ann3depth_tpu.live.capture import OpenCVSource

    src = OpenCVSource((24, 32), video=tiny_video)
    frames = []
    while True:
        f = src.read()
        if f is None:
            break
        frames.append(f)
    src.release()
    assert len(frames) == 8
    assert frames[0].shape == (24, 32, 3)  # resized to requested hw
    # brightness increases frame over frame (content preserved through
    # BGR->RGB + resize)
    assert frames[-1].mean() > frames[0].mean()


def test_opencv_source_missing_file():
    from ann3depth_tpu.live.capture import OpenCVSource

    with pytest.raises(RuntimeError, match="cannot open"):
        OpenCVSource((24, 32), video="/nonexistent/clip.avi")


def test_device_sync_returns_scalar():
    import jax.numpy as jnp

    from ann3depth_tpu.utils.tracing import device_sync

    v = device_sync({"a": jnp.full((3, 3), 7.0)})
    assert v == 7.0


def test_step_timer_stats():
    import time

    from ann3depth_tpu.utils.tracing import StepTimer

    t = StepTimer(window=10)
    assert t.stats() == {}
    for _ in range(5):
        t.start(); time.sleep(0.002); t.stop()
    s = t.stats()
    assert 1.0 < s["step_ms_p50"] < 50.0
    assert s["step_ms_p99"] >= s["step_ms_p50"]


def test_tb_writer_writes_events(tmp_path):
    pytest.importorskip("tensorflow")
    from ann3depth_tpu.utils.tb_writer import TensorBoardWriter

    w = TensorBoardWriter(str(tmp_path))
    w.write_scalars(1, {"loss": 0.5, "rmse": 2.0, "bad": "notanumber"})
    w.write_image(1, "img", np.zeros((8, 8, 3), np.uint8))
    w.flush(); w.close()
    files = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert files, os.listdir(tmp_path)


def test_metrics_writer_jsonl(tmp_path):
    import json

    from ann3depth_tpu.utils.metrics_writer import MetricsWriter

    with MetricsWriter(str(tmp_path)) as w:
        w.write(3, {"loss": 1.5}, note="hi")
    rec = json.loads(open(tmp_path / "metrics.jsonl").read())
    assert rec["step"] == 3 and rec["loss"] == 1.5 and rec["note"] == "hi"


def test_check_regression_retry_runner():
    """Gate hardening (r5, VERDICT r4 Weak #1): a transient runtime error
    retries once and is attributed in `flaked`; a persistent one lands in
    `errors` with partial results intact; programming errors re-raise."""
    import pytest

    from benchmarks.check_regression import run_with_retry

    calls = {"flaky": 0, "dead": 0}

    def ok():
        return {"m_ok": 1.0}

    def flaky():
        calls["flaky"] += 1
        if calls["flaky"] == 1:
            raise RuntimeError("FAILED_PRECONDITION: TPU backend error")
        return {"m_flaky": 2.0}

    def dead():
        calls["dead"] += 1
        raise RuntimeError("UNAVAILABLE: tunnel gone")

    results, flaked, errors = {}, [], []
    run_with_retry([("ok", ok), ("flaky", flaky), ("dead", dead)],
                   results, flaked, errors)
    assert results == {"m_ok": 1.0, "m_flaky": 2.0}
    assert flaked == ["flaky"] and calls["flaky"] == 2
    assert calls["dead"] == 2 and len(errors) == 1
    assert errors[0]["bench"] == "dead" and "UNAVAILABLE" in errors[0]["error"]

    with pytest.raises(TypeError):  # non-transient: loud, no retry
        run_with_retry([("bug", lambda: 1 + "x")], {}, [], [])
