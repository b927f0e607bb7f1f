"""Encoder-decoder depth CNN — the flagship parity model [B:5,8].

Capability parity with the reference's full model (SURVEY §2.1
"Encoder-decoder CNN"): strided-conv encoder, conv decoder with a bilinear
upsampling head; 320x240 RGB in -> 160x120 log-depth out (output stride 2).

TPU-first design (informed by an on-chip profile, 2026-08-16):
- **Space-to-depth stem**: the naive full-res 240x320x32 stem stage was the
  single most HBM-expensive activation and ran at 3->32 channels (MXU lanes
  pad to 128 -> mostly idle). A 4x4 space-to-depth reshapes the input to
  60x80x48 for free, so every conv in the network runs at stride >= 4 with
  >=64 channels; the head predicts log-depth at stride 4 and bilinearly
  upsamples the 1-channel map x2 to the stride-2 [B:8] output.
- **Additive skip connections** (1x1-projected) instead of U-Net concats:
  the profile showed ~1.4 ms/step of pure `copy` from concatenation;
  adds fuse into the surrounding convs.
- **One GroupNorm per stage** (after the strided conv), not per conv:
  norm statistics were ~2.3 ms/step of convert+reduce fusions.
- NHWC, bf16 compute / f32 params; head and loss in f32.
- Upsampling is `jax.image.resize` (bilinear, half-pixel — see
  compat/reference_spec.RESIZE_ALIGN_CORNERS) + conv. No transposed convs
  (strided-scatter lowering + checkerboard).
- Optional `remat` wraps stage blocks in jax.checkpoint to trade FLOPs for
  HBM at large batch.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ann3depth_tpu.ops.resize import upsample2x_matmul


def _conv(features, kernel_size, *, strides=(1, 1), dtype, quant, name):
    """nn.Conv(use_bias=False) or its param-compatible int8 twin
    (ops/quant.QConv) — selected by the model's `quant` field; the param
    tree is identical either way, so bf16-trained checkpoints serve int8
    without conversion. "int8-qat" is the trainable fake-quant simulation
    of the int8 path (STE gradients)."""
    if quant in ("int8", "int8-qat"):
        from ann3depth_tpu.ops.quant import QConv
        return QConv(features, kernel_size, strides, out_dtype=dtype,
                     qat=quant == "int8-qat", name=name)
    return nn.Conv(features, kernel_size, strides=strides, padding="SAME",
                   dtype=dtype, use_bias=False, name=name)


def space_to_depth(x, factor: int = 2):
    """[B, H, W, C] -> [B, H/f, W/f, C*f*f] (free reshape, no compute)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


class Stage(nn.Module):
    """One encoder stage: strided conv -> GroupNorm -> relu -> conv -> relu."""

    features: int
    strides: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    norm: str = "group"  # "group" | "none" (perf-ablation knob)
    quant: str = "none"  # "none" | "int8" (serving path; ops/quant.py)

    @nn.compact
    def __call__(self, x):
        x = _conv(self.features, (3, 3),
                  strides=(self.strides, self.strides), dtype=self.dtype,
                  quant=self.quant, name="conv_down")(x)
        if self.norm == "group":
            x = nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
        x = nn.relu(x)
        y = _conv(self.features, (3, 3), dtype=self.dtype, quant=self.quant,
                  name="conv_refine")(x)
        return nn.relu(x + y)  # residual refine


class UpStage(nn.Module):
    """Decoder stage: 1x1 channel projection at LOW res -> bilinear x2 ->
    3x3 conv + projected additive skip.

    Projecting before the resize halves both the bytes the bilinear gather
    moves and the 3x3 conv's input channels (equal in/out widths keep the
    MXU contraction dense)."""

    features: int
    refine: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    upsample: str = "matmul"  # "matmul" | "resize" (identical math; matmul
    #   keeps NHWC through the dots instead of transposing around a
    #   gather-based resize — measured faster, benchmarks/exp_micro_opts)
    quant: str = "none"  # "none" | "int8" (serving path; ops/quant.py)

    @nn.compact
    def __call__(self, x, skip):
        x = _conv(self.features, (1, 1), dtype=self.dtype, quant=self.quant,
                  name="proj_down")(x)
        b, h, w, c = x.shape
        if self.upsample == "matmul":
            x = upsample2x_matmul(x)
        else:
            x = jax.image.resize(x, (b, h * 2, w * 2, c),
                                 method="bilinear").astype(self.dtype)
        x = _conv(self.features, (3, 3), dtype=self.dtype, quant=self.quant,
                  name="conv_up")(x)
        skip = _conv(self.features, (1, 1), dtype=self.dtype,
                     quant=self.quant, name="proj_skip")(skip)
        x = nn.relu(x + skip)
        if self.refine:
            y = _conv(self.features, (3, 3), dtype=self.dtype,
                      quant=self.quant, name="conv_refine")(x)
            x = nn.relu(x + y)
        return x


class EncDecDepthNet(nn.Module):
    """Space-to-depth stem + strided-conv encoder + bilinear-upsample
    decoder with additive skips; 1-channel bilinear upsampling head.

    All feature maps live at stride >= 4: the profile showed stride-2
    feature work (conv + relu-bwd + norm stats + layout copies at
    120x160x64) dominating the step, while the [B:8] contract only needs
    *depth* at stride 2 — so the head predicts log-depth at stride 4 and
    bilinearly upsamples the single-channel map x2 (the reference's own
    'bilinear upsampling head' shape, at TPU-friendly cost)."""

    width_mult: float = 1.0
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    # Stage widths at strides 4, 8, 16 relative to the input.
    enc_widths: Sequence[int] = (64, 128, 256)
    norm: str = "group"          # "group" | "none" (perf-ablation knob;
    #   "none" measured SLOWER in-step and trains worse — GN stats are
    #   fused ~free, benchmarks/exp_micro_opts)
    upsample: str = "matmul"     # decoder x2: "matmul" | "resize"
    quant: str = "none"          # "none" | "int8" serving convs (same
    #   param tree — bf16-trained checkpoints serve int8 unconverted)
    # Preprocess may hand this model pre-space-to-depth input directly
    # (train/loop.py wires emit_s2d for the XLA preprocess path).
    S2D_INPUT_FACTOR = 4

    OUTPUT_STRIDE = 2  # input HW -> output HW ratio [B:8]

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] normalized f32 -> [B, H/2, W/2, 1] log-depth f32.

        Also accepts the pre-space-to-depth layout [B, H/4, W/4, 48]
        (channel = dy*12 + dx*3 + ch) emitted by
        `ops.pallas_preprocess.oracle_preprocess_s2d` — byte-identical
        features, but the relayout fuses into the preprocess matmuls
        instead of costing a separate HBM copy pass."""
        wm = lambda c: max(32, int(c * self.width_mult) // 8 * 8)
        dt = self.compute_dtype
        if x.shape[-1] == 3:
            x = space_to_depth(x.astype(dt), 4)  # stride 4 for free
        else:
            assert x.shape[-1] == 48, x.shape  # pre-s2d input
            x = x.astype(dt)

        stage = nn.remat(Stage) if self.remat else Stage
        up = nn.remat(UpStage) if self.remat else UpStage

        # Encoder. Stage 0 runs at stride 1 (input already at stride 4).
        widths = [wm(c) for c in self.enc_widths]
        x = stage(widths[0], strides=1, dtype=dt, norm=self.norm,
                  quant=self.quant, name="enc0")(x)
        skips = [x]
        for i, c in enumerate(widths[1:], start=1):
            x = stage(c, strides=2, dtype=dt, norm=self.norm,
                      quant=self.quant, name=f"enc{i}")(x)
            skips.append(x)

        # Decoder back to stride 4 with additive projected skips.
        for i, c in enumerate(reversed(widths[:-1])):
            skip = skips[len(widths) - 2 - i]
            x = up(c, dtype=dt, upsample=self.upsample, quant=self.quant,
                   name=f"dec{i}")(x, skip)

        # Head: f32 3x3 conv to 1 channel at stride 4, then bilinear x2 on
        # the single-channel log-depth map -> stride 2.
        y = nn.Conv(1, (3, 3), padding="SAME", dtype=jnp.float32,
                    name="head")(x.astype(jnp.float32))
        b, h, w, _ = y.shape
        return jax.image.resize(y, (b, h * 2, w * 2, 1), method="bilinear")

    @staticmethod
    def output_hw(input_hw):
        h, w = input_hw
        return (h // EncDecDepthNet.OUTPUT_STRIDE, w // EncDecDepthNet.OUTPUT_STRIDE)
