"""Small 3-conv downsample depth net — the smoke/debug model [B:7].

Capability parity with the reference's minimal model (SURVEY.md §2.1 "Small
depth net"): 320x240 RGB -> coarse depth via three stride-2 convs (output at
1/8 resolution, 30x40 for the canonical input). Batch=1 CPU-viable.

TPU-first notes: NHWC layout (XLA:TPU's native conv layout), optional bf16
compute with f32 params, and channel counts that are multiples of 8 so the
final conv tiles cleanly on the VPU/MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SmallDepthNet(nn.Module):
    """3x {conv stride 2} -> log-depth at 1/8 input resolution."""

    width_mult: float = 1.0
    compute_dtype: jnp.dtype = jnp.float32

    # Output stride of the network (input HW / output HW).
    OUTPUT_STRIDE = 8

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] normalized f32 -> [B, H/8, W/8, 1] log-depth f32."""
        w = lambda c: max(8, int(c * self.width_mult))
        x = x.astype(self.compute_dtype)
        x = nn.Conv(w(32), (5, 5), strides=(2, 2), padding="SAME",
                    dtype=self.compute_dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(w(64), (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.compute_dtype, name="conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.compute_dtype, name="conv3")(x)
        return x.astype(jnp.float32)

    @staticmethod
    def output_hw(input_hw):
        h, w = input_hw
        return (h // SmallDepthNet.OUTPUT_STRIDE, w // SmallDepthNet.OUTPUT_STRIDE)
