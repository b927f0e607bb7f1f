"""Device-side preprocessing: one spec, two executions.

Semantics (the spec, mirroring the reference's preprocess+augment surface —
SURVEY §2.1 "Preprocessing"/"Augmentation", [B:5,9]):
  raw uint8 RGB [B,H,W,3]  -> resized (antialiased triangle, half-pixel
  centers) to input_hw, /255, per-channel standardized; train mode adds
  horizontal flip (p=.5), crop-zoom (p=.5, fixed-ratio window at a random
  offset, realized as a *single* resample from the raw frame), and
  brightness/contrast jitter around the post-crop image mean.
  raw f32 depth [B,dh,dw] -> same geometric transform to target_hw (values
  scaled by the zoom ratio to keep geometry consistent); no photometrics.

Consistency: image and depth share the augmentation draw by sharing the PRNG
key — `augment_params` called with the same key but each tensor's own
in/out shapes yields the same flip/crop decisions mapped to each grid.

Executions:
  - ops/pallas_preprocess.fused_preprocess — the fused VMEM kernel (TPU).
  - ops/pallas_preprocess.oracle_preprocess — identical math in plain XLA
    (CPU tests, parity oracle, non-TPU backends).
Both are driven by the same packed [B,8] param rows, so parity tests compare
like for like.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ann3depth_tpu.compat import reference_spec as ref
from ann3depth_tpu.ops import pallas_preprocess as pp

RGB_MEAN = jnp.asarray(ref.RGB_MEAN, jnp.float32)
RGB_STD = jnp.asarray(ref.RGB_STD, jnp.float32)


def normalize_rgb(img_f32):
    """[..., 3] float RGB in [0,1] -> standardized."""
    return (img_f32 - RGB_MEAN) / RGB_STD


def denormalize_rgb(img):
    return jnp.clip(img * RGB_STD + RGB_MEAN, 0.0, 1.0)


def resize_bilinear(x, hw):
    """Half-pixel-center resize (antialiased triangle — reference_spec
    RESIZE_ALIGN_CORNERS=False semantics)."""
    shape = (*x.shape[:-3], hw[0], hw[1], x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear")


def preprocess_image(img_u8, input_hw, use_pallas=False, emit_s2d=0,
                     precision=None):
    """uint8 [B, H, W, 3] -> normalized f32 [B, h, w, 3] (no augment).

    emit_s2d: nonzero (XLA path) -> pre-space-to-depth bf16 layout
    [B, h/f, w/f, f*f*3] for stems that consume it directly (encdec).

    precision: matmul precision for the XLA resize. None -> HIGHEST on
    both branches (eval/live parity — the s2d branch must not silently
    diverge from the rgb branch, ADVICE r2); serving benches may pass
    DEFAULT explicitly since the model computes in bf16 anyway."""
    b, h, w, _ = img_u8.shape
    prec = jax.lax.Precision.HIGHEST if precision is None else precision
    params = pp.identity_params(b, (h, w), input_hw)
    if emit_s2d and not use_pallas:
        return pp.oracle_preprocess_s2d(img_u8, params,
                                        out_hw=tuple(input_hw),
                                        factor=emit_s2d, precision=prec)
    if use_pallas:
        return pp.fused_preprocess(img_u8, params, out_hw=tuple(input_hw))
    return pp.oracle_preprocess(img_u8, params, out_hw=tuple(input_hw),
                                precision=prec)


def preprocess_depth(depth, target_hw, use_pallas=False):
    """f32 [B, dh, dw] linear depth -> [B, th, tw] resized."""
    b, dh, dw = depth.shape
    params = pp.identity_params(b, (dh, dw), target_hw)
    fn = pp.fused_preprocess if use_pallas else pp.oracle_preprocess
    out = fn(depth[..., None], params, out_hw=tuple(target_hw),
             depth_mode=True)
    return out[..., 0]


def preprocess_batch(img_u8, depth, input_hw, target_hw, key=None,
                     use_pallas=False, precision=None, emit_s2d=0):
    """Full pipeline: raw uint8 + raw depth -> model-ready (img, depth).

    key=None -> eval path (plain resize+normalize); key given -> train
    path with fused flip/crop/jitter augmentation.

    precision: matmul precision for the XLA resize path. None -> HIGHEST
    (exact f32; the eval/parity default — GT depth must not pick up
    truncation noise). The train step passes DEFAULT: the model computes
    in bf16 anyway and exact-f32 resize costs ~11% of the step (measured
    2.35 -> 2.10 ms/step at b16, BASELINE.md).

    emit_s2d: if nonzero (XLA path only), the image comes back as the
    pre-space-to-depth bf16 layout [B, h/f, w/f, f*f*3] the encdec stem
    consumes directly (ops/pallas_preprocess.oracle_preprocess_s2d) —
    the stem relayout copies fuse into the resize matmuls.
    """
    import jax

    b, h, w, _ = img_u8.shape
    _, dh, dw = depth.shape
    input_hw, target_hw = tuple(input_hw), tuple(target_hw)

    if key is None:
        img_params = pp.identity_params(b, (h, w), input_hw)
        dep_params = pp.identity_params(b, (dh, dw), target_hw)
    else:
        # Same key -> same flip/crop draws, mapped onto each source grid.
        img_params = pp.augment_params(key, b, (h, w), input_hw)
        dep_params = pp.augment_params(key, b, (dh, dw), target_hw)

    if use_pallas:
        img = pp.fused_preprocess(img_u8, img_params, out_hw=input_hw)
        dep = pp.fused_preprocess(depth[..., None], dep_params,
                                  out_hw=target_hw, depth_mode=True)[..., 0]
    else:
        prec = jax.lax.Precision.HIGHEST if precision is None else precision
        if emit_s2d:
            img = pp.oracle_preprocess_s2d(img_u8, img_params,
                                           out_hw=input_hw, factor=emit_s2d,
                                           precision=prec)
        else:
            img = pp.oracle_preprocess(img_u8, img_params, out_hw=input_hw,
                                       precision=prec)
        dep = pp.oracle_preprocess(depth[..., None], dep_params,
                                   out_hw=target_hw, depth_mode=True,
                                   precision=prec)[..., 0]
    return img, dep
