"""Live path tests: native ring buffer correctness + producer/consumer
stress (SURVEY §5 "Race detection"), capture thread, and the end-to-end
headless live loop."""

import threading
import time

import numpy as np
import pytest

from ann3depth_tpu.live.ring_buffer import FrameRingBuffer


@pytest.fixture(params=["native", "python"])
def ring_kind(request):
    return request.param


def _mk_ring(kind, capacity=4, shape=(8, 8, 3)):
    rb = FrameRingBuffer(capacity, shape, force_python=(kind == "python"))
    if kind == "native" and not rb.native:
        pytest.skip("native ringbuffer unavailable (no g++)")
    return rb


def test_ring_empty(ring_kind):
    rb = _mk_ring(ring_kind)
    frame, fid, drops = rb.pop_latest()
    assert frame is None and fid == -1
    rb.close()


def test_ring_push_pop_roundtrip(ring_kind):
    rb = _mk_ring(ring_kind)
    f = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3) % 255
    rb.push(f)
    out, fid, drops = rb.pop_latest()
    np.testing.assert_array_equal(out, f)
    assert fid == 0 and drops == 0
    rb.close()


def test_ring_latest_semantics_and_drop_count(ring_kind):
    rb = _mk_ring(ring_kind)
    for i in range(3):
        rb.push(np.full((8, 8, 3), i, np.uint8))
    out, fid, _ = rb.pop_latest()
    assert fid == 2 and out[0, 0, 0] == 2
    for i in range(3, 6):
        rb.push(np.full((8, 8, 3), i, np.uint8))
    out, fid, drops = rb.pop_latest()
    assert fid == 5 and drops == 2  # frames 3,4 skipped
    stats = rb.stats()
    assert stats["pushed"] == 6 and stats["popped"] == 2
    rb.close()


def test_ring_overwrite_wraps(ring_kind):
    rb = _mk_ring(ring_kind, capacity=2)
    for i in range(10):
        rb.push(np.full((8, 8, 3), i * 20, np.uint8))
    out, fid, _ = rb.pop_latest()
    assert fid == 9 and out[0, 0, 0] == 180
    rb.close()


@pytest.mark.parametrize("kind", ["native", "python"])
@pytest.mark.slow
def test_ring_stress_no_torn_frames(kind):
    """TSan-style stress (SURVEY §5): producer hammers, consumer validates
    every popped frame is internally consistent (all bytes equal)."""
    rb = _mk_ring(kind, capacity=3, shape=(32, 32, 3))
    n_frames = 2000
    errors = []

    def producer():
        for i in range(n_frames):
            rb.push(np.full((32, 32, 3), i % 251, np.uint8))

    def consumer(stop):
        while not stop.is_set():
            frame, fid, _ = rb.pop_latest()
            if frame is None:
                continue
            lo, hi = int(frame.min()), int(frame.max())
            if lo != hi:
                errors.append((fid, lo, hi))
            if (fid % 251) != lo:
                errors.append(("id-mismatch", fid, lo))

    stop = threading.Event()
    c = threading.Thread(target=consumer, args=(stop,))
    p = threading.Thread(target=producer)
    c.start(); p.start()
    p.join(timeout=60)
    stop.set(); c.join(timeout=10)
    assert not errors, errors[:5]
    assert rb.stats()["pushed"] == n_frames
    rb.close()


def test_capture_thread_synthetic():
    from ann3depth_tpu.live.capture import CaptureThread, SyntheticSource

    ring = FrameRingBuffer(4, (24, 32, 3))
    src = SyntheticSource((24, 32), fps=200.0)
    cap = CaptureThread(src, ring, target_fps=200.0).start()
    time.sleep(0.2)
    cap.stop()
    assert ring.stats()["pushed"] >= 5
    frame, fid, _ = ring.pop_latest()
    assert frame is not None and frame.shape == (24, 32, 3)
    ring.close()


@pytest.mark.slow
def test_latency_decomposition_fields():
    """LiveEngine.latency_decomposition: components measured, projection
    consistent (program + transport at the assumed local link)."""
    from ann3depth_tpu.config import ModelConfig
    from ann3depth_tpu.live.infer import LiveEngine
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.train import step as steplib

    model = registry.build(ModelConfig(name="small", compute_dtype="float32"))
    params = steplib.init_params(model, (24, 32), seed=0)
    eng = LiveEngine(model.apply, params, (48, 64), (24, 32),
                     display_hw=(48, 64))
    d = eng.latency_decomposition(n=3)
    assert d["frame_bytes"] == 48 * 64 * 3
    assert d["rendered_bytes"] == 48 * 64 * 3
    for k in ("h2d_ms_here", "program_ms", "d2h_ms_here", "e2e_ms_here"):
        assert d[k] > 0
    transport_ms = (d["frame_bytes"] + d["rendered_bytes"]) / (
        d["local_link_gbps_assumed"] * 1e9) * 1e3
    assert d["projected_local_chip_e2e_ms"] == pytest.approx(
        d["program_ms"] + transport_ms, abs=0.01)


@pytest.mark.slow
def test_live_loop_headless(tmp_path):
    """End-to-end: synthetic source -> ring -> engine -> stats [B:10]."""
    import dataclasses

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.live import viewer
    from ann3depth_tpu.live.capture import SyntheticSource

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, input_hw=(48, 64)),
        live=dataclasses.replace(cfg.live, frame_hw=(96, 128), target_fps=100),
        train=dataclasses.replace(cfg.train, ckpt_dir=str(tmp_path / "none")),
    )
    src = SyntheticSource((96, 128), fps=100)
    record = str(tmp_path / "session.avi")
    stats = viewer.run(cfg, display=False, max_frames=10, source=src,
                       record=record)
    assert stats["frames"] == 10
    assert np.isfinite(stats["latency_p50_ms"])
    assert stats["ring_pushed"] > 0
    # --record captured every displayed frame at frame resolution
    import pytest
    cv2 = pytest.importorskip("cv2")
    cap = cv2.VideoCapture(record)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert stats["record"] == record and n == 10


def test_live_engine_temporal_smoothing():
    """smooth=0.6: frame 1 passes through, frame 2 equals the log-depth
    EMA of the two unsmoothed predictions; reset forgets the carry."""
    from ann3depth_tpu.config import ModelConfig
    from ann3depth_tpu.live.infer import LiveEngine
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.train import step as steplib

    model = registry.build(ModelConfig(name="small", compute_dtype="float32"))
    params = steplib.init_params(model, (24, 32), seed=0)
    rng = np.random.default_rng(7)
    f1, f2 = (rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
              for _ in range(2))

    plain = LiveEngine(model.apply, params, (48, 64), (24, 32))
    d1 = np.asarray(plain.infer(f1, fetch_depth=True)[0])
    d2 = np.asarray(plain.infer(f2, fetch_depth=True)[0])

    eng = LiveEngine(model.apply, params, (48, 64), (24, 32), smooth=0.6)
    s1 = np.asarray(eng.infer(f1, fetch_depth=True)[0])
    s2 = np.asarray(eng.infer(f2, fetch_depth=True)[0])
    np.testing.assert_allclose(s1, d1, rtol=1e-5)
    want = np.exp(0.6 * np.log(d1) + 0.4 * np.log(d2))
    np.testing.assert_allclose(s2, want, rtol=1e-4)
    assert not np.allclose(s2, d2)  # genuinely smoothed

    eng.reset_smoothing()
    s1b = np.asarray(eng.infer(f1, fetch_depth=True)[0])
    np.testing.assert_allclose(s1b, d1, rtol=1e-5)

    with pytest.raises(ValueError, match="smooth"):
        LiveEngine(model.apply, params, (48, 64), (24, 32), smooth=1.0)


def test_colormap_luts_and_gray_property():
    """Named colormap LUTs: shape/range; 'gray' renders R==G==B through
    the full device program; unknown names fail loudly (engine ctor
    validates before compiling)."""
    import numpy as np
    import pytest

    from ann3depth_tpu.config import ModelConfig
    from ann3depth_tpu.live.infer import COLORMAPS, LiveEngine, colormap_lut
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.train import step as steplib

    assert set(COLORMAPS) == {"turbo", "viridis", "magma", "gray"}
    for name in COLORMAPS:
        lut = np.asarray(colormap_lut(name))
        assert lut.shape == (256, 3)
        assert lut.min() >= 0 and lut.max() <= 255
    with pytest.raises(ValueError, match="unknown colormap"):
        colormap_lut("jet")

    model = registry.build(ModelConfig(name="small", compute_dtype="float32"))
    params = steplib.init_params(model, (24, 32), seed=0)
    eng = LiveEngine(model.apply, params, (48, 64), (24, 32),
                     colormap="gray")
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    _, rendered, _ = eng.infer(frame)
    assert rendered.shape == (48, 64, 3)
    np.testing.assert_array_equal(rendered[..., 0], rendered[..., 1])
    np.testing.assert_array_equal(rendered[..., 1], rendered[..., 2])
    assert rendered.max() > rendered.min()  # actually renders a gradient

    turbo = LiveEngine(model.apply, params, (48, 64), (24, 32))
    _, r2, _ = turbo.infer(frame)
    assert not np.array_equal(r2, rendered)  # colormap actually switches

    with pytest.raises(ValueError, match="unknown colormap"):
        LiveEngine(model.apply, params, (48, 64), (24, 32), colormap="jet")


def test_cli_colormap_flag_resolves():
    from ann3depth_tpu.cli import _resolve, build_parser

    args = build_parser().parse_args(
        ["infer", "--config", "smoke", "--image", "x.png",
         "--colormap", "viridis"])
    assert _resolve(args).live.colormap == "viridis"
    args = build_parser().parse_args(["live", "--config", "smoke",
                                      "--colormap", "magma"])
    assert _resolve(args).live.colormap == "magma"
