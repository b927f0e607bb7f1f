"""Offline video -> depth-video transcoding (throughput twin of the live path).

The live viewer (live/viewer.py) optimizes LATENCY: one frame in flight,
ring buffer, display-rate pacing (SURVEY §3.2). This module optimizes
THROUGHPUT for offline files: frames are batched into the SAME fused device
program (live/infer.live_step — preprocess + forward + colormap in one XLA
computation; batch just widens the leading dim, so serving-style batch
scaling applies, BASELINE.md serving rows) and double-buffered so the host
decodes/encodes video while the device computes the previous batch.

Completes the continuous-inference surface (SURVEY §2.1 live row) with an
artifact path: a depth-colormapped (optionally side-by-side) video plus
optional raw depth maps, instead of an on-screen rendering.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

# Container -> codec. MJPG/avi is the safest OpenCV build-independent pair;
# mp4v needs an mp4-capable build and falls back loudly if absent.
_FOURCC = {".avi": "MJPG", ".mp4": "mp4v", ".mov": "mp4v", ".mkv": "MJPG"}


def _open_writer(cv2, path, fps, wh):
    ext = os.path.splitext(path)[1].lower()
    code = _FOURCC.get(ext, "MJPG")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*code), fps, wh)
    if not w.isOpened():
        raise RuntimeError(
            f"cv2.VideoWriter cannot open {path!r} (codec {code}); "
            "use an .avi output path (MJPG) if this build lacks mp4 codecs")
    return w


def transcode(cfg, video: str, out_path: str, *, batch: int = 8,
              side_by_side: bool = False, depth_npy: Optional[str] = None,
              max_frames: Optional[int] = None, state=None,
              use_ema: bool = False, ckpt_step: Optional[int] = None,
              tta: str = "") -> dict:
    """Transcode a video file into a depth-rendered video.

    Args:
      cfg: resolved Config (model/checkpoint/input_hw).
      video: input video path (anything cv2.VideoCapture opens).
      out_path: output video path; frames are the turbo-colormapped depth
        at the input resolution, or input|depth side by side.
      batch: device batch (static shape; the last batch is padded).
      depth_npy: optional path for the raw linear-depth stack
        [N, h, w] float32 at the model's output resolution.
      max_frames: stop after this many frames (smoke/testing).
      state: pre-restored TrainState (tests); default: restore latest
        checkpoint from cfg.train.ckpt_dir like the live viewer.
      tta: "flip" averages each prediction with the mirrored-frame
        prediction (offline quality lever, ~2x forward FLOPs —
        BASELINE.md tta_encdec row).

    Returns a stats dict (frames, fps throughput, output paths).
    """
    import cv2
    import jax

    from ann3depth_tpu.live.infer import live_step
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.train import loop as looplib

    if state is None:
        state = looplib.create_state(cfg)
        from ann3depth_tpu.train.checkpoint import CheckpointManager
        ckpt = CheckpointManager(cfg.train.ckpt_dir)
        state, restored = ckpt.restore_params(state, use_ema=use_ema,
                                              step=ckpt_step)
        ckpt.close()
        if restored is None:
            log.warning("no checkpoint in %s — running with random weights",
                        cfg.train.ckpt_dir)

    cap = cv2.VideoCapture(video)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open video {video!r}")
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    if not (h and w):
        cap.release()
        raise RuntimeError(f"video {video!r} reports no frame size")

    params = jax.device_put(state.params)
    emit_s2d = registry.s2d_input_factor(cfg.model.name)

    def _submit(frames_u8):
        # live_step is jitted on (batch, h, w) — constant across the file,
        # so the program compiles once. Dispatch is async; device_get in
        # _drain is the sync point (tunnel-safe, utils/tracing.py).
        return live_step(state.apply_fn, params, frames_u8,
                         input_hw=cfg.data.input_hw, display_hw=(h, w),
                         emit_s2d=emit_s2d, colormap=cfg.live.colormap,
                         tta=tta)

    out_wh = (w * 2 if side_by_side else w, h)
    writer = _open_writer(cv2, out_path, src_fps, out_wh)

    def _read_batch():
        """-> (frames [batch,h,w,3] u8 RGB, rgb copies, n_valid)."""
        frames = np.zeros((batch, h, w, 3), np.uint8)
        n = 0
        while n < batch:
            ok, bgr = cap.read()
            if not ok:
                break
            frames[n] = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            n += 1
        return frames, n

    depths = [] if depth_npy is not None else None
    frames_done = 0
    in_flight = None  # ((depth_dev, rendered_dev), inputs, n_valid)
    t0 = time.perf_counter()

    def _drain(entry):
        nonlocal frames_done
        (depth_dev, rendered_dev), inputs, n = entry
        rendered = np.asarray(jax.device_get(rendered_dev))[:n]
        if depths is not None:
            depths.append(np.asarray(jax.device_get(depth_dev))[:n])
        for i in range(n):
            frame = rendered[i]
            if side_by_side:
                frame = np.concatenate([inputs[i], frame], axis=1)
            writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        frames_done += n

    try:
        while max_frames is None or frames_done < max_frames:
            frames, n = _read_batch()
            if max_frames is not None:
                budget = max_frames - frames_done
                if in_flight is not None:
                    budget -= in_flight[2]
                n = min(n, max(budget, 0))
            token = (_submit(frames), frames, n) if n else None
            if in_flight is not None:
                _drain(in_flight)
            in_flight = token
            if token is None:
                break
        if in_flight is not None:
            _drain(in_flight)
    finally:
        cap.release()
        writer.release()

    wall = time.perf_counter() - t0
    stats = {
        "video": video,
        "out": out_path,
        "frames": frames_done,
        "frame_hw": [h, w],
        "batch": batch,
        "wall_s": round(wall, 3),
        "frames_per_sec": round(frames_done / wall, 2) if wall > 0 else 0.0,
        "source_fps": round(src_fps, 3),
    }
    if depths is not None:
        # zero-frame placeholder shape = the model's OUTPUT resolution,
        # matching what non-empty transcodes write (live_step returns
        # depth at output hw, not input hw)
        out_hw = registry.output_hw(cfg.model.name, tuple(cfg.data.input_hw))
        stack = (np.concatenate(depths, axis=0) if depths
                 else np.zeros((0, *out_hw), np.float32))
        np.save(depth_npy, stack)
        stats["depth_npy"] = depth_npy
        stats["depth_hw"] = list(stack.shape[1:])
    return stats
