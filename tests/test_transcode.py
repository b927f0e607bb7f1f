"""Offline video -> depth-video transcoding (live/transcode.py; the
throughput twin of the live viewer, SURVEY §2.1 live row)."""

import dataclasses
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from ann3depth_tpu.config import get_config
from ann3depth_tpu.live import transcode


def _write_clip(path, n=10, hw=(96, 128), fps=15):
    h, w = hw
    wtr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"),
                          fps, (w, h))
    assert wtr.isOpened()
    rng = np.random.default_rng(0)
    for i in range(n):
        frame = np.full((h, w, 3), (i * 23) % 255, np.uint8)
        frame[:, : w // 2] = rng.integers(0, 255, (h, w // 2, 3), np.uint8)
        wtr.write(frame)
    wtr.release()


def _read_frames(path):
    cap = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return frames


def _smoke_cfg(tmp_path):
    cfg = get_config("smoke")
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, input_hw=(48, 64)),
        train=dataclasses.replace(cfg.train,
                                  ckpt_dir=str(tmp_path / "no_ckpt")),
    )


def test_transcode_pads_last_batch_and_writes_depth(tmp_path):
    """10 frames at batch 4 exercises the padded final batch; raw depth
    stack rides along via depth_npy."""
    clip = tmp_path / "clip.avi"
    _write_clip(clip, n=10, hw=(96, 128))
    out = str(tmp_path / "out.avi")
    dnpy = str(tmp_path / "depth.npy")
    stats = transcode.transcode(_smoke_cfg(tmp_path), str(clip), out,
                                batch=4, depth_npy=dnpy)
    assert stats["frames"] == 10 and stats["frame_hw"] == [96, 128]
    frames = _read_frames(out)
    assert len(frames) == 10
    assert frames[0].shape == (96, 128, 3)
    depth = np.load(dnpy)
    assert depth.shape[0] == 10 and depth.shape[1:] == tuple(
        stats["depth_hw"])
    assert np.isfinite(depth).all() and (depth > 0).all()
    # depth varies across the frame (a real prediction, not a constant)
    assert depth.std() > 0


def test_transcode_max_frames_and_side_by_side(tmp_path):
    clip = tmp_path / "clip.avi"
    _write_clip(clip, n=9, hw=(96, 128))
    out = str(tmp_path / "sbs.avi")
    stats = transcode.transcode(_smoke_cfg(tmp_path), str(clip), out,
                                batch=4, side_by_side=True, max_frames=5)
    assert stats["frames"] == 5
    frames = _read_frames(out)
    assert len(frames) == 5
    # input|depth side by side doubles the width
    assert frames[0].shape == (96, 256, 3)


def test_transcode_tta_flip_matches_manual_ensemble(tmp_path):
    """--tta flip on the video path (ADVICE r3: was a silent orphan flag)
    is the exact linear-depth average of the plain prediction and the
    mirrored prediction of the mirrored frame — the apply_with_tta
    identity, verified through live_step's raw-frame mirror."""
    import jax

    from ann3depth_tpu.live.infer import live_step
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.train import loop as looplib

    cfg = _smoke_cfg(tmp_path)
    state = looplib.create_state(cfg)
    params = jax.device_put(state.params)
    emit_s2d = registry.s2d_input_factor(cfg.model.name)
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (1, 96, 128, 3), np.uint8)
    kw = dict(input_hw=cfg.data.input_hw, display_hw=(96, 128),
              emit_s2d=emit_s2d)

    d_tta, _ = live_step(state.apply_fn, params, frame, tta="flip", **kw)
    d_plain, _ = live_step(state.apply_fn, params, frame, **kw)
    d_flip, _ = live_step(state.apply_fn, params, frame[:, :, ::-1, :], **kw)
    manual = 0.5 * (np.asarray(d_plain) + np.asarray(d_flip)[:, :, ::-1])
    np.testing.assert_allclose(np.asarray(d_tta), manual, rtol=2e-3)


def test_transcode_tta_flag_threads_through(tmp_path):
    """infer --video --tta flip actually changes the output depth."""
    clip = tmp_path / "clip.avi"
    _write_clip(clip, n=4, hw=(96, 128))
    cfg = _smoke_cfg(tmp_path)
    outs = {}
    for tta in ("", "flip"):
        dnpy = str(tmp_path / f"d_{tta or 'plain'}.npy")
        transcode.transcode(cfg, str(clip),
                            str(tmp_path / f"o_{tta or 'plain'}.avi"),
                            batch=4, depth_npy=dnpy, tta=tta)
        outs[tta] = np.load(dnpy)
    assert outs[""].shape == outs["flip"].shape
    # random-init weights are not mirror-symmetric: the ensemble differs
    assert not np.allclose(outs[""], outs["flip"])


def test_transcode_rejects_missing_video(tmp_path):
    with pytest.raises(RuntimeError, match="cannot open video"):
        transcode.transcode(_smoke_cfg(tmp_path),
                            str(tmp_path / "nope.avi"),
                            str(tmp_path / "out.avi"))


def test_cli_infer_video_end_to_end(tmp_path, capsys):
    """CLI surface: infer --video writes <stem>_depth.avi + stats JSON."""
    from ann3depth_tpu.cli import main

    clip = tmp_path / "walk.avi"
    _write_clip(clip, n=6, hw=(96, 128))
    rc = main(["infer", "--config", "smoke",
               "--ckpt-dir", str(tmp_path / "no_ckpt"),
               "--video", str(clip), "--out-dir", str(tmp_path / "out"),
               "--video-batch", "4", "--depth-npy"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["frames"] == 6
    assert os.path.basename(stats["out"]) == "walk_depth.avi"
    assert len(_read_frames(stats["out"])) == 6
    assert np.load(stats["depth_npy"]).shape[0] == 6


def test_cli_infer_requires_exactly_one_source(tmp_path):
    from ann3depth_tpu.cli import main

    with pytest.raises(SystemExit, match="exactly one"):
        main(["infer", "--config", "smoke",
              "--ckpt-dir", str(tmp_path / "c"),
              "--out-dir", str(tmp_path)])
    with pytest.raises(SystemExit, match="exactly one"):
        main(["infer", "--config", "smoke",
              "--ckpt-dir", str(tmp_path / "c"),
              "--image", "a.jpg", "--video", "b.avi",
              "--out-dir", str(tmp_path)])
