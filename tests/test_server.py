"""Batched serving server (ann3depth_tpu/server.py): request coalescing,
bucket padding, HTTP round-trip."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from ann3depth_tpu import server as serverlib

RAW_HW = (24, 32)


def _ref_fn(frames):
    """Deterministic stand-in for the jitted serving program: depth map =
    per-frame mean intensity broadcast to a half-res grid."""
    frames = np.asarray(frames)
    assert frames.dtype == np.uint8 and frames.ndim == 4
    mean = frames.reshape(frames.shape[0], -1).mean(axis=1).astype(np.float32)
    return np.broadcast_to(mean[:, None, None],
                           (frames.shape[0], RAW_HW[0] // 2,
                            RAW_HW[1] // 2)).copy()


@pytest.fixture
def service():
    svc = serverlib.BatchingService(_ref_fn, RAW_HW, max_batch=8,
                                    max_delay_s=0.01)
    yield svc
    svc.close()


def _frame(seed):
    return np.random.default_rng(seed).integers(
        0, 256, (*RAW_HW, 3), dtype=np.uint8)


def test_buckets():
    assert serverlib._buckets(1) == [1]
    assert serverlib._buckets(8) == [1, 2, 4, 8]
    assert serverlib._buckets(12) == [1, 2, 4, 8, 12]


def test_single_request(service):
    f = _frame(0)
    out = service.predict(f)
    np.testing.assert_allclose(out, _ref_fn(f[None])[0], rtol=1e-6)
    assert service.stats()["requests"] == 1


def test_concurrent_requests_correct_and_coalesced(service):
    """12 concurrent clients: every response matches its own frame (no
    cross-wiring through the shared batch), and the batcher coalesced at
    least once (fewer batches than requests)."""
    frames = [_frame(i) for i in range(12)]
    results = [None] * 12

    def worker(i):
        results[i] = service.predict(frames[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    for i in range(12):
        np.testing.assert_allclose(results[i], _ref_fn(frames[i][None])[0],
                                   rtol=1e-6)
    st = service.stats()
    assert st["requests"] == 12
    assert st["batches"] < 12  # coalescing actually happened


def test_padding_to_bucket():
    """3 queued requests run as one padded bucket-4 batch; the pad rows
    never leak into responses."""
    seen_batches = []

    def spy_fn(frames):
        seen_batches.append(frames.shape[0])
        return _ref_fn(frames)

    svc = serverlib.BatchingService(spy_fn, RAW_HW, max_batch=8,
                                    max_delay_s=0.05)
    try:
        frames = [_frame(i) for i in range(3)]
        results = [None] * 3

        def worker(i):
            results[i] = svc.predict(frames[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i in range(3):
            np.testing.assert_allclose(results[i],
                                       _ref_fn(frames[i][None])[0], rtol=1e-6)
        assert all(b in (1, 2, 4) for b in seen_batches)  # bucket sizes only
    finally:
        svc.close()


def test_rejects_wrong_shape(service):
    with pytest.raises(ValueError, match="expected uint8"):
        service.predict(np.zeros((8, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="expected uint8"):
        service.predict(np.zeros((*RAW_HW, 3), np.float32))


def test_fn_error_propagates_and_service_survives(service):
    """An exception in the device fn reaches the waiting client as that
    exception, and the dispatch thread keeps serving afterwards."""
    orig = service._fn

    def boom(frames):
        service._fn = orig  # fail exactly one batch
        raise ValueError("injected device failure")

    service._fn = boom
    with pytest.raises(ValueError, match="injected device failure"):
        service.predict(_frame(99))
    f = _frame(1)
    np.testing.assert_allclose(service.predict(f), _ref_fn(f[None])[0])


def test_fixed_batch_pads_every_dispatch():
    """fixed_batch (fixed-batch exported artifacts) pins all dispatches —
    including warmup — to exactly that shape."""
    sizes = []

    def spy(frames):
        sizes.append(frames.shape[0])
        return _ref_fn(frames)

    svc = serverlib.BatchingService(spy, RAW_HW, fixed_batch=4)
    try:
        svc.warmup()
        f = _frame(3)
        np.testing.assert_allclose(svc.predict(f), _ref_fn(f[None])[0])
        assert set(sizes) == {4}
        assert svc.max_batch == 4
    finally:
        svc.close()


def test_closed_service_rejects_and_post_close_futures_fail():
    svc = serverlib.BatchingService(_ref_fn, RAW_HW, max_batch=2)
    svc.close()
    with pytest.raises(RuntimeError, match="closed"):
        svc.predict(_frame(0))


def test_warmup_hits_every_bucket():
    sizes = []

    def spy(frames):
        sizes.append(frames.shape[0])
        return _ref_fn(frames)

    svc = serverlib.BatchingService(spy, RAW_HW, max_batch=8)
    try:
        svc.warmup()
        assert sizes == [1, 2, 4, 8]
    finally:
        svc.close()


def test_http_roundtrip():
    svc = serverlib.BatchingService(_ref_fn, RAW_HW, max_batch=4,
                                    max_delay_s=0.005)
    srv = serverlib.DepthServer(svc, port=0).serve_background()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        # health + stats
        with urllib.request.urlopen(f"{base}/healthz", timeout=10) as r:
            assert json.load(r)["ok"] is True

        # single frame -> [h,w]
        f = _frame(7)
        buf = io.BytesIO()
        np.save(buf, f)
        req = urllib.request.Request(f"{base}/v1/depth", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            out = np.load(io.BytesIO(r.read()))
        np.testing.assert_allclose(out, _ref_fn(f[None])[0], rtol=1e-6)

        # batch body -> [B,h,w]
        fb = np.stack([_frame(1), _frame(2)])
        buf = io.BytesIO()
        np.save(buf, fb)
        req = urllib.request.Request(f"{base}/v1/depth", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            out = np.load(io.BytesIO(r.read()))
        np.testing.assert_allclose(out, _ref_fn(fb), rtol=1e-6)

        # malformed body -> 400
        req = urllib.request.Request(f"{base}/v1/depth", data=b"not npy",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 400

        with urllib.request.urlopen(f"{base}/v1/stats", timeout=10) as r:
            st = json.load(r)
        assert st["requests"] >= 3
    finally:
        srv.close()


def test_service_from_config_real_model():
    """End-to-end with the real jitted serving program (small model,
    random init): correct output shape and agreement with a direct call."""
    from ann3depth_tpu import serving
    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.train import step as steplib

    import dataclasses
    import jax

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, input_hw=(48, 64)))
    svc = serverlib.service_from_config(cfg, init=True, raw_hw=(56, 72),
                                        max_batch=2, max_delay_s=0.005)
    try:
        f = np.random.default_rng(0).integers(0, 256, (56, 72, 3),
                                              dtype=np.uint8)
        out = svc.predict(f)
        model = registry.build(cfg.model)
        params = steplib.init_params(model, cfg.data.input_hw,
                                     seed=cfg.train.seed)
        direct = jax.jit(serving.make_serving_fn(
            model, cfg.model.name, cfg.data.input_hw))(params, f[None])
        np.testing.assert_allclose(out, np.asarray(direct)[0],
                                    rtol=1e-5, atol=1e-5)
        assert np.all(out > 0)  # linear depth
    finally:
        svc.close()


def test_buckets_with_multiple():
    assert serverlib._buckets(32, 4) == [4, 8, 16, 32]
    assert serverlib._buckets(12, 4) == [4, 8, 12]
    assert serverlib._buckets(4, 4) == [4]


def test_batch_multiple_pads_and_rounds():
    """batch_multiple (DP serving) keeps every dispatched shape divisible:
    min bucket = multiple, max_batch rounds up, warmup hits each bucket."""
    sizes = []

    def spy(frames):
        assert frames.shape[0] % 4 == 0
        sizes.append(frames.shape[0])
        return _ref_fn(frames)

    svc = serverlib.BatchingService(spy, RAW_HW, max_batch=10,
                                    batch_multiple=4, max_delay_s=0.005)
    try:
        assert svc.max_batch == 12 and svc._buckets == [4, 8, 12]
        svc.warmup()
        assert sizes == [4, 8, 12]
        f = _frame(11)
        np.testing.assert_allclose(svc.predict(f), _ref_fn(f[None])[0],
                                   rtol=1e-6)
        assert svc.stats()["batch_multiple"] == 4
    finally:
        svc.close()

    with pytest.raises(ValueError, match="divisible"):
        serverlib.BatchingService(_ref_fn, RAW_HW, fixed_batch=6,
                                  batch_multiple=4)


def test_service_from_config_dp_matches_single_device():
    """DP serving (batch sharded over the fake 8-device CPU mesh) returns
    the same depths as the single-device service for the same frames."""
    import dataclasses

    from ann3depth_tpu.config import get_config

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, input_hw=(48, 64)))
    frames = [np.random.default_rng(i).integers(0, 256, (56, 72, 3),
                                                dtype=np.uint8)
              for i in range(6)]

    svc1 = serverlib.service_from_config(cfg, init=True, raw_hw=(56, 72),
                                         max_batch=8, max_delay_s=0.005)
    try:
        ref = [svc1.predict(f) for f in frames]
    finally:
        svc1.close()

    svc4 = serverlib.service_from_config(cfg, init=True, raw_hw=(56, 72),
                                         max_batch=8, max_delay_s=0.02,
                                         dp=4)
    try:
        assert svc4.batch_multiple == 4
        futs = [svc4.submit(f) for f in frames]  # coalesce across devices
        out = [fut.result(timeout=60.0) for fut in futs]
        st = svc4.stats()
    finally:
        svc4.close()

    for o, r in zip(out, ref):
        np.testing.assert_allclose(o, r, rtol=2e-2, atol=2e-2)
    # every dispatched bucket was divisible by dp
    assert all(int(k) <= 8 for k in st["batch_size_hist"])


def test_service_from_config_dp_zero_uses_all_devices():
    import dataclasses

    import jax

    from ann3depth_tpu.config import get_config

    cfg = get_config("smoke")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, input_hw=(48, 64)))
    svc = serverlib.service_from_config(cfg, init=True, raw_hw=(56, 72),
                                        max_batch=16, dp=0)
    try:
        assert svc.batch_multiple == len(jax.devices())
    finally:
        svc.close()

    with pytest.raises(ValueError, match="devices"):
        serverlib.service_from_config(cfg, init=True, raw_hw=(56, 72),
                                      dp=len(jax.devices()) + 1)
