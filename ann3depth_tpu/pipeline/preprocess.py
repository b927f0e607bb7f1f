"""Reference (unfused) preprocessing in pure jnp — the oracle path.

Mirrors the reference's host-side preprocess (SURVEY.md §2.1 "Preprocessing"
/ "Augmentation"): uint8 RGB -> resize to the model input shape -> scale to
[0,1] -> per-channel standardize; depth -> resize to the target shape; train
mode adds horizontal flip / crop / brightness-contrast jitter applied
consistently to image+depth [B:9].

This module is the *correctness oracle*: ops/pallas_preprocess.py (the fused
VMEM kernel, [B:5]) is parity-tested against it. It is itself jittable and
runs on device, so even the "slow path" never does per-pixel Python work.

Augmentation is functional: randomness comes from an explicit jax PRNG key,
so a data-parallel feed can fold in the step/shard index and stay
reproducible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ann3depth_tpu.compat import reference_spec as ref

RGB_MEAN = jnp.asarray(ref.RGB_MEAN, jnp.float32)
RGB_STD = jnp.asarray(ref.RGB_STD, jnp.float32)


def normalize_rgb(img_f32):
    """[..., 3] float RGB in [0,1] -> standardized."""
    return (img_f32 - RGB_MEAN) / RGB_STD


def denormalize_rgb(img):
    return jnp.clip(img * RGB_STD + RGB_MEAN, 0.0, 1.0)


def resize_bilinear(x, hw):
    """Bilinear resize with half-pixel centers (TF1 align_corners=False —
    see reference_spec.RESIZE_ALIGN_CORNERS)."""
    shape = (*x.shape[:-3], hw[0], hw[1], x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear")


def preprocess_image(img_u8, input_hw):
    """uint8 [..., H, W, 3] -> normalized f32 [..., h, w, 3]."""
    x = img_u8.astype(jnp.float32) / 255.0
    x = resize_bilinear(x, input_hw)
    return normalize_rgb(x)


def preprocess_depth(depth, target_hw):
    """f32 [..., H, W] linear depth -> [..., h, w] resized.

    Nearest-style semantics would preserve the invalid-pixel mask exactly;
    we use bilinear on depth (reference-era convention) and recompute the
    validity mask from the resized values (losses.py re-masks anyway).
    """
    x = depth[..., None]
    x = jax.image.resize(x, (*x.shape[:-3], target_hw[0], target_hw[1], 1),
                         method="bilinear")
    return x[..., 0]


def augment(key, img, depth):
    """Random horizontal flip + brightness/contrast jitter + random crop-zoom.

    img:   [B, h, w, 3] normalized f32 (post preprocess_image)
    depth: [B, h', w'] f32 linear depth
    Geometric ops are applied consistently to both; photometric only to img.
    Fully batched and jit-safe (no data-dependent shapes): the crop is a
    fixed-ratio (87.5%) crop at a random offset, realized as a gatherless
    resize of a dynamically-sliced window.
    """
    kflip, kbright, kcontrast, kcrop, kdo = jax.random.split(key, 5)
    b = img.shape[0]

    # --- horizontal flip (p=0.5 per example), consistent img+depth ---
    flip = jax.random.bernoulli(kflip, 0.5, (b,))
    img = jnp.where(flip[:, None, None, None], img[:, :, ::-1, :], img)
    depth = jnp.where(flip[:, None, None], depth[:, :, ::-1], depth)

    # --- photometric jitter in normalized space (img only) ---
    brightness = jax.random.uniform(kbright, (b, 1, 1, 1), minval=-0.2, maxval=0.2)
    contrast = jax.random.uniform(kcontrast, (b, 1, 1, 1), minval=0.8, maxval=1.2)
    mean = jnp.mean(img, axis=(1, 2, 3), keepdims=True)
    img = (img - mean) * contrast + mean + brightness

    # --- random crop-zoom (p=0.5 per example) ---
    # Crop an 87.5% window at a random aligned offset and resize back.
    # Depth is *not* rescaled: a center-crop zoom changes apparent depth by
    # the zoom factor; following the reference-era convention we divide
    # depth by the zoom ratio to keep geometry consistent.
    do_crop = jax.random.bernoulli(kdo, 0.5, (b,))
    ratio = 0.875
    oy = jax.random.uniform(kcrop, (b,), minval=0.0, maxval=1.0)
    ox = jax.random.uniform(jax.random.fold_in(kcrop, 1), (b,), minval=0.0, maxval=1.0)

    def crop_one(x, off_y, off_x):
        """x: [h, w, c]; crop ratio window at normalized offset, resize back."""
        h, w = x.shape[0], x.shape[1]
        ch, cw = int(h * ratio), int(w * ratio)
        y0 = jnp.round(off_y * (h - ch)).astype(jnp.int32)
        x0 = jnp.round(off_x * (w - cw)).astype(jnp.int32)
        win = jax.lax.dynamic_slice(x, (y0, x0, 0), (ch, cw, x.shape[2]))
        return jax.image.resize(win, x.shape, method="bilinear")

    img_c = jax.vmap(crop_one)(img, oy, ox)
    depth_c = jax.vmap(crop_one)(depth[..., None], oy, ox)[..., 0] * ratio
    img = jnp.where(do_crop[:, None, None, None], img_c, img)
    depth = jnp.where(do_crop[:, None, None], depth_c, depth)

    return img, depth


def preprocess_batch(img_u8, depth, input_hw, target_hw, key=None):
    """Full oracle pipeline: raw uint8 batch -> model-ready (img, depth)."""
    x = preprocess_image(img_u8, input_hw)
    d = preprocess_depth(depth, target_hw)
    if key is not None:
        x, d = augment(key, x, d)
    return x, d
