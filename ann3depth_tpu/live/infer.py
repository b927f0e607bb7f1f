"""Live inference engine: fused preprocess + forward + colormap on device
(SURVEY §3.2 rebuild plan, [B:5,10] — target <15 ms p50 per 640x480 frame).

The whole per-frame device program is ONE jitted XLA computation:
  uint8 frame -> fused resize/normalize (Pallas kernel on TPU)
              -> encdec forward (bf16 MXU)
              -> linear depth
              -> turbo-colormapped uint8 RGB at display resolution
so the host does nothing between capture and display except one H2D of the
raw uint8 frame and one D2H of the rendered frame. Fixed shapes: compiled
once at startup (no per-frame recompilation).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ann3depth_tpu.pipeline import preprocess

# Colormaps as 16 anchor points each, interpolated to 256 LUT entries on
# device (the per-frame render is one jnp.take gather whatever the map).
# Anchors sampled from the canonical tables (turbo: Google AI; viridis/
# magma: matplotlib) at 16 evenly spaced positions.
_CMAP_ANCHORS = {
    "turbo": np.array([
        [48, 18, 59], [65, 69, 171], [70, 117, 237], [57, 162, 252],
        [27, 207, 212], [36, 236, 166], [97, 252, 108], [164, 252, 59],
        [215, 232, 36], [246, 193, 31], [252, 147, 26], [239, 93, 17],
        [213, 51, 7], [173, 22, 2], [121, 7, 1], [122, 4, 3]], np.float32),
    "viridis": np.array([
        [68, 1, 84], [72, 26, 108], [71, 47, 125], [65, 68, 135],
        [57, 86, 140], [49, 104, 142], [42, 120, 142], [35, 136, 142],
        [31, 152, 139], [34, 168, 132], [53, 183, 121], [84, 197, 104],
        [122, 209, 81], [165, 219, 54], [210, 226, 27], [253, 231, 37]],
        np.float32),
    "magma": np.array([
        [0, 0, 4], [11, 9, 36], [28, 16, 68], [53, 15, 106],
        [80, 18, 123], [105, 28, 128], [130, 37, 129], [156, 46, 127],
        [182, 54, 121], [208, 65, 111], [230, 81, 98], [245, 107, 92],
        [251, 136, 97], [254, 166, 113], [254, 196, 136], [252, 253, 191]],
        np.float32),
    "gray": np.stack([np.linspace(0, 255, 16)] * 3, axis=1).astype(
        np.float32),
}
COLORMAPS = tuple(sorted(_CMAP_ANCHORS))


def colormap_lut(name: str = "turbo"):
    """[256, 3] f32 LUT for a named colormap (device-side gather table)."""
    try:
        anchors = _CMAP_ANCHORS[name]
    except KeyError:
        raise ValueError(f"unknown colormap {name!r}; have {COLORMAPS}")
    xs = np.linspace(0, 15, 256)
    i0 = np.clip(xs.astype(int), 0, 14)
    t = (xs - i0)[:, None]
    lut = anchors[i0] * (1 - t) + anchors[i0 + 1] * t
    return jnp.asarray(lut, jnp.float32)  # [256, 3]


@functools.partial(jax.jit, static_argnames=("apply_fn", "input_hw",
                                             "display_hw", "use_pallas",
                                             "emit_s2d", "smooth",
                                             "colormap", "tta"))
def live_step(apply_fn, params, frame_u8, *, input_hw, display_hw,
              use_pallas=False, emit_s2d=0, prev_log=None, has_prev=None,
              smooth=0.0, colormap="turbo", tta=""):
    """[1, H, W, 3] uint8 -> (depth [1, h, w], rendered [1, Hd, Wd, 3] u8).

    emit_s2d: hand the model the pre-space-to-depth layout straight from
    the preprocess matmuls (encdec stems; train/loop.py wires the same).

    smooth > 0: temporal EMA over frames in log-depth —
    logd_t = smooth * logd_{t-1} + (1-smooth) * logd (kills frame-to-frame
    flicker in the live view); prev_log carries the previous smoothed
    log-depth, has_prev (f32 scalar, 0 on the first frame) gates the blend
    so frame 0 passes through. The smoothed program additionally returns
    the new carry: (depth, rendered, logd).

    tta="flip": also run the horizontally mirrored frame and average the
    two predictions in linear depth (logaddexp in log space — same
    ensemble as train/step.apply_with_tta). Doubles the forward FLOPs, so
    it is an OFFLINE lever (infer --video), not a live-viewer one; the
    mirror happens on the raw uint8 frame because emit_s2d-packed layouts
    do not flip by axis reversal."""
    # DEFAULT resize precision is the live path's deliberate choice (the
    # model computes in bf16; exact-f32 resize would add MXU passes to a
    # latency-bound program) — the recorded live-latency baselines measure
    # this program. preprocess_image itself defaults to HIGHEST for the
    # eval/parity surfaces (ADVICE r2).
    images = preprocess.preprocess_image(frame_u8, input_hw,
                                         use_pallas=use_pallas,
                                         emit_s2d=emit_s2d,
                                         precision=jax.lax.Precision.DEFAULT)
    pred_log = apply_fn({"params": params}, images)
    if tta == "flip":
        images_f = preprocess.preprocess_image(
            frame_u8[:, :, ::-1, :], input_hw, use_pallas=use_pallas,
            emit_s2d=emit_s2d, precision=jax.lax.Precision.DEFAULT)
        pred_f = apply_fn({"params": params}, images_f)
        pred_log = (jnp.logaddexp(pred_log, pred_f[:, :, ::-1, :])
                    - jnp.log(2.0).astype(pred_log.dtype))
    elif tta:
        raise ValueError(f"unknown tta mode {tta!r} (have: 'flip')")
    logd = pred_log[..., 0]
    if smooth > 0:
        blended = smooth * prev_log + (1.0 - smooth) * logd
        logd = jnp.where(has_prev > 0, blended, logd)
    depth = jnp.exp(logd)

    # normalize per-frame to [0,1] for display (log scale reads better)
    lo = jnp.min(logd, axis=(1, 2), keepdims=True)
    hi = jnp.max(logd, axis=(1, 2), keepdims=True)
    norm = (logd - lo) / jnp.maximum(hi - lo, 1e-6)

    # upscale to display resolution on device, then colormap via LUT gather.
    # Exact integer upscale goes through the fixed-matmul path (keeps NHWC,
    # no gather transposes — ops/resize.upsample_matmul).
    b, h, w = norm.shape
    dh, dw = display_hw
    if dh % h == 0 and dw % w == 0 and dh // h == dw // w and dh > h:
        from ann3depth_tpu.ops.resize import upsample_matmul
        disp = upsample_matmul(norm[..., None], dh // h)[..., 0]
    else:
        disp = jax.image.resize(norm, (b, *display_hw), method="bilinear")
    idx = jnp.clip((disp * 255.0).astype(jnp.int32), 0, 255)
    rendered = jnp.take(colormap_lut(colormap), idx, axis=0).astype(jnp.uint8)
    if smooth > 0:
        return depth, rendered, logd
    return depth, rendered


class LiveEngine:
    """Premapped, precompiled per-frame inference."""

    def __init__(self, apply_fn, params, frame_hw, input_hw,
                 display_hw=None, use_pallas=None, emit_s2d=0, smooth=0.0,
                 colormap="turbo"):
        self.apply_fn = apply_fn
        self.params = jax.device_put(params)
        self.frame_hw = tuple(frame_hw)
        self.input_hw = tuple(input_hw)
        self.display_hw = tuple(display_hw or frame_hw)
        if use_pallas is None:
            use_pallas = False  # XLA path fuses better in-program (BASELINE.md)
        self.use_pallas = bool(use_pallas)
        self.emit_s2d = 0 if self.use_pallas else int(emit_s2d)
        if not 0.0 <= smooth < 1.0:
            raise ValueError(f"smooth must be in [0, 1), got {smooth}")
        self.smooth = float(smooth)
        colormap_lut(colormap)  # validate the name before compiling
        self.colormap = colormap
        dummy = jnp.zeros((1, *self.frame_hw, 3), jnp.uint8)
        if self.smooth > 0:
            # Temporal-EMA carry: its shape is the model's depth output,
            # learned via eval_shape (trace only — no compile, no device).
            shapes = jax.eval_shape(
                lambda p, f: live_step(
                    self.apply_fn, p, f, input_hw=self.input_hw,
                    display_hw=self.display_hw, use_pallas=self.use_pallas,
                    emit_s2d=self.emit_s2d),
                self.params, dummy)
            self._carry = jnp.zeros(shapes[0].shape, jnp.float32)
            self._has_prev = jnp.zeros((), jnp.float32)
            self._one = jnp.ones((), jnp.float32)
        # compile once at startup with a dummy frame; sync via device_get —
        # block_until_ready returns before the (server-side) compile
        # finishes on tunneled TPU backends (utils/tracing.py).
        d, r = self._step(dummy)
        jax.device_get(r[0, 0, 0])
        if self.smooth > 0:  # the warmup frame must not seed the EMA
            self.reset_smoothing()

    def reset_smoothing(self):
        """Forget the temporal-EMA carry (stream restart / scene cut)."""
        if self.smooth > 0:
            self._carry = jnp.zeros_like(self._carry)
            self._has_prev = jnp.zeros((), jnp.float32)

    def _step(self, frame_dev):
        if self.smooth > 0:
            depth, rendered, logd = live_step(
                self.apply_fn, self.params, frame_dev,
                input_hw=self.input_hw, display_hw=self.display_hw,
                use_pallas=self.use_pallas, emit_s2d=self.emit_s2d,
                prev_log=self._carry, has_prev=self._has_prev,
                smooth=self.smooth, colormap=self.colormap)
            # Device-side carry: the next submit depends on this frame's
            # output without any host sync, so pipelining still overlaps.
            self._carry, self._has_prev = logd, self._one
            return depth, rendered
        return live_step(self.apply_fn, self.params, frame_dev,
                         input_hw=self.input_hw, display_hw=self.display_hw,
                         use_pallas=self.use_pallas, emit_s2d=self.emit_s2d,
                         colormap=self.colormap)

    def infer(self, frame_u8: np.ndarray, fetch_depth: bool = False):
        """One frame -> (depth, rendered np [Hd,Wd,3], latency_s).

        depth is a device array unless fetch_depth (saves one D2H roundtrip
        per frame on the latency path)."""
        t0 = time.perf_counter()
        frame_dev = jnp.asarray(frame_u8[None])
        depth, rendered = self._step(frame_dev)
        rendered = np.asarray(jax.device_get(rendered))[0]
        if fetch_depth:
            depth = np.asarray(jax.device_get(depth))[0]
        return depth, rendered, time.perf_counter() - t0

    # -- pipelined API: keep one frame in flight to overlap H2D/compute of
    #    frame k+1 with the D2H of frame k (hides one tunnel RTT) --

    def submit(self, frame_u8: np.ndarray):
        """Dispatch a frame; returns an opaque in-flight token."""
        return (self._step(jnp.asarray(frame_u8[None])), time.perf_counter())

    def retrieve(self, token, fetch_depth: bool = False):
        """Complete an in-flight token -> (depth, rendered, latency_s)."""
        (depth, rendered), t0 = token
        rendered = np.asarray(jax.device_get(rendered))[0]
        if fetch_depth:
            depth = np.asarray(jax.device_get(depth))[0]
        return depth, rendered, time.perf_counter() - t0

    def device_step_latency(self, n: int = 50) -> float:
        """Amortized per-frame latency of the full device program with a
        device-resident input (excludes host<->device transport): the
        per-chip number for the <15 ms [B:5] target on hardware where the
        chip is locally attached."""
        frame = jnp.zeros((1, *self.frame_hw, 3), jnp.uint8)
        d, r = self._step(frame)
        jax.device_get(r[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(n):
            d, r = self._step(frame)
        jax.device_get(r[0, 0, 0])
        return (time.perf_counter() - t0) / n

    # Conservative host-link assumption for the locally-attached-chip
    # projection: TPU hosts attach chips over PCIe Gen3/4; 8 GB/s is the
    # low end of practical pinned-memory DMA throughput.
    LOCAL_LINK_GBPS = 8.0

    def latency_decomposition(self, n: int = 30) -> dict:
        """Split per-frame latency into H2D / device program / D2H and
        project the end-to-end latency of a LOCALLY-ATTACHED chip.

        In this environment the chip sits behind a network tunnel, so the
        measured h2d/d2h are tunnel transport — reported for transparency,
        but the [B:10] <15 ms target describes a local chip, where the
        transfers are PCIe DMAs of the same byte counts. The projection is
        program_ms + frame_bytes/LINK + rendered_bytes/LINK (milliseconds).
        """
        frame_np = np.zeros((1, *self.frame_hw, 3), np.uint8)
        frame_bytes = frame_np.nbytes
        dev = jnp.asarray(frame_np)
        _, r0 = self._step(dev)
        jax.device_get(r0[0, 0, 0])
        rendered_bytes = (
            self.display_hw[0] * self.display_hw[1] * 3)  # uint8 RGB out

        # H2D (this host -> device, through whatever link exists here).
        t0 = time.perf_counter()
        for _ in range(n):
            d = jnp.asarray(frame_np)
            jax.device_get(d[0, 0, 0, 0])  # placement-complete sync
        h2d = (time.perf_counter() - t0) / n

        # device program, device-resident input
        program = self.device_step_latency(n)

        # D2H of the rendered frame
        _, r = self._step(dev)
        jax.device_get(r[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(n):
            np.asarray(jax.device_get(r))
        d2h = (time.perf_counter() - t0) / n

        local_link = self.LOCAL_LINK_GBPS * 1e9
        projected = (program
                     + frame_bytes / local_link
                     + rendered_bytes / local_link)
        return {
            "h2d_ms_here": round(h2d * 1e3, 3),
            "program_ms": round(program * 1e3, 3),
            "d2h_ms_here": round(d2h * 1e3, 3),
            "e2e_ms_here": round((h2d + program + d2h) * 1e3, 3),
            "frame_bytes": int(frame_bytes),
            "rendered_bytes": int(rendered_bytes),
            "local_link_gbps_assumed": self.LOCAL_LINK_GBPS,
            "projected_local_chip_e2e_ms": round(projected * 1e3, 3),
        }
