"""Multi-scale coarse+fine depth CNN (the Eigen et al. 2014 family).

Capability breadth beyond the reference's pair of CNNs (SURVEY §2.1 lists
a small 3-conv net and one encoder-decoder): the third classic
architecture of the 2014-17 monocular-depth era — a GLOBAL coarse stack
whose full-image receptive field predicts scene layout, plus a FINE stack
that adds local detail (Eigen, Puhrsch & Fergus, NeurIPS 2014; Eigen &
Fergus, ICCV 2015). Re-designed TPU-first rather than translated:

- **Global context without fully-connected layers.** The paper's coarse
  stack ends in two FC layers over the flattened 1/32-scale feature map —
  an MXU-hostile [B, h*w*c] x [h*w*c, k] matmul whose parameter HBM reads
  dominate at training batch sizes (the kernel alone would outweigh the
  rest of the model ~10x). The rebuild gets the same full-image receptive
  field from global average pooling -> a two-layer MLP -> broadcast-add
  back onto the coarse features: exactly full-image context, O(c^2)
  params, and the GAP/broadcast fuse into the surrounding convs.
- **One shared space-to-depth stem.** The paper's fine stack re-runs a
  stride-4 9x9 conv over raw RGB. Here both scales consume the same
  s2d(4) stem features (computed once, stride 4, >=48 channels from the
  first matmul — the encdec stem finding, models/encdec.py): full-res
  pixel detail is preserved exactly by the relayout, and no conv ever
  runs at <48 input channels.
- **Structural stage-wise coupling instead of stage-wise training.** The
  paper trains scale 1 to convergence, freezes it, then trains scale 2 —
  two jobs, two schedules. The rebuild trains jointly in one jitted step
  but makes the fine stack predict a RESIDUAL on top of the upsampled
  coarse log-depth map (final = coarse + fine_residual): the coarse
  branch must carry the low-frequency signal — the fine branch cannot
  bypass it — which is the coupling the two-phase protocol exists to
  enforce, at zero orchestration cost.
- Same contract as every registry model: [B,H,W,3] normalized f32 (or
  the pre-s2d [B,H/4,W/4,48] layout) -> [B,H/2,W/2,1] log-depth f32;
  NHWC, bf16 compute / f32 params, head + residual sum in f32.

Pricing vs encdec on the synthetic convergence protocol lives in
BASELINE.md (benchmarks/exp_multiscale.py).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ann3depth_tpu.models.encdec import Stage, space_to_depth
from ann3depth_tpu.ops.resize import upsample_matmul


class GlobalContext(nn.Module):
    """Full-image receptive field: GAP -> MLP -> broadcast-add.

    The TPU-native stand-in for the Eigen coarse stack's FC layers (see
    module docstring); the broadcast add keeps the block residual, so the
    local conv pathway stays intact underneath it."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        g = jnp.mean(x, axis=(1, 2))  # [B, C] full-image pool
        g = nn.relu(nn.Dense(self.features, dtype=self.dtype,
                             name="mlp_in")(g))
        g = nn.Dense(self.features, dtype=self.dtype, name="mlp_out")(g)
        return x + g[:, None, None, :]


class MultiScaleDepthNet(nn.Module):
    """Coarse global stack + fine residual stack over a shared s2d stem.

    Scale 1 (coarse): stride 4 -> 8 -> 16 strided-conv stages, a
    GlobalContext block at stride 16, a 1-channel coarse log-depth head,
    bilinearly upsampled x4 back to stride 4 (matmul form — the measured
    encdec decoder choice, benchmarks/exp_micro_opts).

    Scale 2 (fine): two conv stages at stride 4 on [stem features ++
    coarse map] (concatenating ONE channel is a cheap pad; everything
    else fuses additively), predicting a residual log-depth correction.

    Output: bilinear x2 of (coarse + residual) -> stride 2 [B:8] shape.
    """

    width_mult: float = 1.0
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    # Widths at strides (4, 8, 16); fine stack runs at widths[0].
    widths: Sequence[int] = (64, 128, 256)

    S2D_INPUT_FACTOR = 4
    OUTPUT_STRIDE = 2

    @nn.compact
    def __call__(self, x):
        wm = lambda c: max(32, int(c * self.width_mult) // 8 * 8)
        dt = self.compute_dtype
        if x.shape[-1] == 3:
            x = space_to_depth(x.astype(dt), 4)
        else:
            assert x.shape[-1] == 48, x.shape  # pre-s2d input
            x = x.astype(dt)
        stage = nn.remat(Stage) if self.remat else Stage
        widths = [wm(c) for c in self.widths]

        # Shared stem at stride 4 (input already s2d to stride 4).
        stem = stage(widths[0], strides=1, dtype=dt, name="stem")(x)

        # -- scale 1: global coarse ------------------------------------
        c = stage(widths[1], strides=2, dtype=dt, name="coarse1")(stem)
        c = stage(widths[2], strides=2, dtype=dt, name="coarse2")(c)
        c = GlobalContext(widths[2], dtype=dt, name="context")(c)
        coarse = nn.Conv(1, (3, 3), padding="SAME", dtype=jnp.float32,
                         name="coarse_head")(c.astype(jnp.float32))
        coarse = upsample_matmul(coarse, 4)  # back to stride 4

        # -- scale 2: fine residual ------------------------------------
        f = jnp.concatenate([stem, coarse.astype(dt)], axis=-1)
        f = stage(widths[0], strides=1, dtype=dt, name="fine1")(f)
        f = stage(widths[0], strides=1, dtype=dt, name="fine2")(f)
        residual = nn.Conv(1, (3, 3), padding="SAME", dtype=jnp.float32,
                           name="fine_head")(f.astype(jnp.float32))

        y = coarse + residual
        b, h, w, _ = y.shape
        return jax.image.resize(y, (b, h * 2, w * 2, 1), method="bilinear")

    @staticmethod
    def output_hw(input_hw):
        h, w = input_hw
        return (h // MultiScaleDepthNet.OUTPUT_STRIDE,
                w // MultiScaleDepthNet.OUTPUT_STRIDE)
