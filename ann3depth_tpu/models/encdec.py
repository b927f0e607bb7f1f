"""Encoder-decoder depth CNN — the flagship parity model [B:5,8].

Capability parity with the reference's full model (SURVEY.md §2.1
"Encoder-decoder CNN"): strided-conv encoder, conv decoder with a bilinear
upsampling head; 320x240 RGB in -> 160x120 log-depth out (output stride 2).

TPU-first design:
- NHWC + channels in multiples of 32: every conv lowers to MXU matmuls with
  full 128-lane tiles once im2col'd by XLA.
- bf16 compute / f32 params: MXU-native precision; the loss and the final
  head run in f32.
- Upsampling is `jax.image.resize` (bilinear, half-pixel centers — see
  compat/reference_spec.RESIZE_ALIGN_CORNERS) followed by a conv; XLA fuses
  the resize gather into the surrounding elementwise work. No transposed
  convs: they lower to strided scatter on TPU and checkerboard anyway.
- U-Net style skip connections from encoder stages (concat), which the
  reference-era architecture family used to recover spatial detail.
- Optional `remat` wraps encoder stages in jax.checkpoint to trade FLOPs for
  HBM at large batch.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding="SAME", dtype=self.dtype, use_bias=False)(x)
        x = nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
        return nn.relu(x)


class EncDecDepthNet(nn.Module):
    """Strided-conv encoder + bilinear-upsample decoder, log-depth head."""

    width_mult: float = 1.0
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    # Encoder channel plan; stage i downsamples by 2 (stride-2 entry conv).
    enc_widths: Sequence[int] = (32, 64, 128, 256)

    OUTPUT_STRIDE = 2  # input HW -> output HW ratio [B:8]

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] normalized f32 -> [B, H/2, W/2, 1] log-depth f32."""
        wm = lambda c: max(32, int(c * self.width_mult) // 8 * 8)
        dt = self.compute_dtype
        x = x.astype(dt)

        block = ConvBlock
        if self.remat:
            block = nn.remat(ConvBlock)

        # Encoder: stem at full res, then 4 stride-2 stages.
        # 240x320 -> 120x160 -> 60x80 -> 30x40 -> 15x20
        x = block(wm(32), strides=1, dtype=dt, name="stem")(x)
        skips = []
        for i, c in enumerate(self.enc_widths):
            x = block(wm(c), strides=2, dtype=dt, name=f"down{i}_a")(x)
            x = block(wm(c), strides=1, dtype=dt, name=f"down{i}_b")(x)
            skips.append(x)

        # Decoder: 3 bilinear x2 upsamples back to output stride 2,
        # each fused with a skip concat + conv.  15x20 -> 120x160.
        dec_widths = list(reversed([wm(c) for c in self.enc_widths[:-1]]))
        for i, c in enumerate(dec_widths):
            b, h, w, _ = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, x.shape[-1]),
                                 method="bilinear").astype(dt)
            skip = skips[len(dec_widths) - 1 - i]
            x = jnp.concatenate([x, skip], axis=-1)
            x = block(c, strides=1, dtype=dt, name=f"up{i}")(x)

        # Head: full-precision 3x3 conv to 1 channel of log-depth.
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=jnp.float32,
                    name="head")(x.astype(jnp.float32))
        return x

    @staticmethod
    def output_hw(input_hw):
        h, w = input_hw
        return (h // EncDecDepthNet.OUTPUT_STRIDE, w // EncDecDepthNet.OUTPUT_STRIDE)
