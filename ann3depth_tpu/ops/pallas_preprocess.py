"""Fused Pallas preprocessing kernel — the flagship device kernel [B:5].

One VMEM pass per frame: raw uint8 HWC image -> resized (antialiased
triangle, half-pixel centers), normalized, augmented (flip / crop-zoom /
brightness-contrast) float tensor. Replaces the reference's host-side
scipy/PIL/TF-CPU preprocess chain (SURVEY §2.2 table) with on-device work
that overlaps the H2D feed.

Design (ops/resize.py has the shared math):
- Resize is two dense matmuls on the MXU:
      R = Ay @ X          Ay: [h, H]        X: [H, W*C] (channel-interleaved)
      Z = R @ T           T:  [W*C, w*C]    (kron(Ax^T, I_C), built via iota)
  Both weight matrices are built *inside* the kernel from per-example
  scalars (start/scale per axis) using 2-D broadcasted_iota — flip and
  crop-zoom are pure parameter changes, so augmentation costs nothing
  extra. No gathers anywhere.
- Normalization folds into a per-channel affine on Z (scale/bias built from
  column-index iota), and photometric jitter is a per-image affine around
  the post-crop mean — all VPU work fused after the matmuls.
- Depth maps run through the same kernel with C=1 and an output scale
  (crop-zoom divides depth by the zoom ratio to keep geometry consistent).
  Depth resampling is mask-aware: invalid laser pixels (zero / saturated
  beyond MAKE3D_DEPTH_CAP) are excluded by resampling d*v and v through the
  same triangle weights and renormalizing; sub-threshold footprints emit 0
  (= invalid downstream). See reference_spec.DEPTH_VALID_RESAMPLE_THRESH.
- Precision: X converts u8->f32; the row matmul runs f32 (Ay is small);
  the column matmul runs bf16 x bf16 -> f32 on the MXU (T is the big
  operand; bf16 halves its VMEM). End-to-end error vs the f32 XLA oracle
  is < 1% of pixel range (asserted in tests/test_pallas_preprocess.py).

Grid is (B,); Pallas double-buffers the next frame's DMA against the
current frame's compute automatically.

Per-example geometric params are shipped as a [B, 8] f32 array in SMEM:
  [y_start, y_scale, x_start, x_scale, out_scale, brightness, contrast,
   photo_flag]
computed on host/XLA by `augment_params` (pure jnp, jit-safe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ann3depth_tpu.compat import reference_spec as ref
from ann3depth_tpu.ops.resize import (triangle_matrix,
                                      triangle_matrix_interleaved,
                                      window_params)

CROP_FRAC = 0.875  # crop-zoom window fraction (pipeline/preprocess.py)


# ---------------------------------------------------------------------------
# Parameter packing (runs in XLA, outside the kernel).
# ---------------------------------------------------------------------------

def identity_params(batch, in_hw, out_hw):
    """[B, 8] params for plain resize+normalize (eval/live path)."""
    h_in, w_in = in_hw
    h_out, w_out = out_hw
    row = jnp.array(
        [0.0, h_in / h_out, 0.0, w_in / w_out, 1.0, 0.0, 1.0, 0.0],
        jnp.float32)
    return jnp.tile(row[None, :], (batch, 1))


def augment_params(key, batch, in_hw, out_hw):
    """Sample per-example augmentation -> [B, 8] kernel params.

    flip(p=.5), crop-zoom(p=.5, fixed CROP_FRAC window at random offset),
    brightness U(-.2,.2), contrast U(.8,1.2). Matches the oracle
    pipeline/preprocess.augment semantics (geometry as one resample).
    """
    kflip, kcrop, koy, kox, kb, kc = jax.random.split(key, 6)
    h_in, w_in = in_hw
    h_out, w_out = out_hw

    flip = jax.random.bernoulli(kflip, 0.5, (batch,))
    do_crop = jax.random.bernoulli(kcrop, 0.5, (batch,))
    frac = jnp.where(do_crop, CROP_FRAC, 1.0)
    oy = jax.random.uniform(koy, (batch,))
    ox = jax.random.uniform(kox, (batch,))

    y_start, y_scale = window_params(h_in, h_out, crop_start=oy, crop_frac=frac)
    x_start, x_scale = window_params(w_in, w_out, crop_start=ox, crop_frac=frac,
                                     flip=flip)
    out_scale = frac  # depth *= frac under crop-zoom (preprocess.augment)
    brightness = jax.random.uniform(kb, (batch,), minval=-0.2, maxval=0.2)
    contrast = jax.random.uniform(kc, (batch,), minval=0.8, maxval=1.2)
    photo = jnp.ones((batch,))
    return jnp.stack([y_start, y_scale, x_start, x_scale, out_scale,
                      brightness, contrast, photo], axis=1).astype(jnp.float32)


def geometry_of(params):
    """Split the packed param row for oracle/test use."""
    return dict(y_start=params[..., 0], y_scale=params[..., 1],
                x_start=params[..., 2], x_scale=params[..., 3],
                out_scale=params[..., 4], brightness=params[..., 5],
                contrast=params[..., 6], photo=params[..., 7])


# ---------------------------------------------------------------------------
# The kernel.
# ---------------------------------------------------------------------------

def _preprocess_kernel(p_ref, x_ref, o_ref, *, in_hw, out_hw, channels,
                       norm, depth_mode):
    h_in, w_in = in_hw
    h_out, w_out = out_hw
    c = channels

    i = pl.program_id(0)  # p_ref is the scalar-prefetch [B, 8] SMEM array
    y_start, y_scale = p_ref[i, 0], p_ref[i, 1]
    x_start, x_scale = p_ref[i, 2], p_ref[i, 3]
    out_scale = p_ref[i, 4]
    brightness, contrast, photo = p_ref[i, 5], p_ref[i, 6], p_ref[i, 7]

    # Row resize: [h_out, h_in] @ [h_in, w_in*c] on the MXU, exact f32
    # (HIGHEST: default precision truncates f32 matmul operands).
    ay = triangle_matrix(h_out, h_in, y_start, y_scale)
    x = x_ref[0]
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.int32)  # Mosaic lacks a direct u8->f32 cast
    x = x.astype(jnp.float32)
    if depth_mode:
        # Validity decided on the RAW laser grid, before any blending:
        # resample d*v and v through the same weights, renormalize below.
        v = ((x > ref.DEPTH_EPS) & (x <= ref.MAKE3D_DEPTH_CAP)).astype(
            jnp.float32)
        x = x * v
    r = jnp.dot(ay, x, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    # Column resize via the interleaved kron matrix, bf16 MXU.
    t = triangle_matrix_interleaved(w_in, w_out, c, x_start, x_scale)
    z = jnp.dot(r.astype(jnp.bfloat16), t.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)

    if depth_mode:
        # Mask-aware renormalization; no normalization/photometrics for
        # depth; crop-zoom scales values by out_scale. Sub-threshold
        # footprints emit 0 = invalid (reference_spec).
        rv = jnp.dot(ay, v, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        zv = jnp.dot(rv.astype(jnp.bfloat16), t.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        d = z / jnp.maximum(zv, 1e-6)
        o_ref[0] = jnp.where(zv >= ref.DEPTH_VALID_RESAMPLE_THRESH,
                             d * out_scale, 0.0)
        return

    if norm:
        # Per-channel affine: v/255 standardized. Channel = col % c.
        # Constants enter as Python scalars (Pallas kernels cannot capture
        # constant arrays).
        col_ch = jax.lax.broadcasted_iota(jnp.int32, (h_out, w_out * c), 1) % c
        s = [1.0 / (255.0 * sd) for sd in ref.RGB_STD]
        b = [-m / sd for m, sd in zip(ref.RGB_MEAN, ref.RGB_STD)]
        scale = jnp.where(col_ch == 0, s[0],
                          jnp.where(col_ch == 1, s[1], s[2]))
        bias = jnp.where(col_ch == 0, b[0],
                         jnp.where(col_ch == 1, b[1], b[2]))
        n = z * scale + bias
    else:
        n = z / 255.0

    # Photometric jitter around the per-image mean (post-crop, matching the
    # oracle order flip -> crop -> photometric).
    m = jnp.mean(n)
    jittered = (n - m) * contrast + m + brightness
    o_ref[0] = jnp.where(photo > 0.5, jittered, n)


def _vmem_bytes(in_hw, out_hw, c):
    h_in, w_in = in_hw
    h_out, w_out = out_hw
    return int(
        2 * h_in * w_in * c            # u8 input block (double-buffered)
        + h_in * w_in * c * 4          # f32 X
        + h_out * h_in * 4             # Ay
        + h_out * w_in * c * 4         # R f32 (+bf16 copy /2)
        + h_out * w_in * c * 2
        + w_in * w_out * c * c * 2     # T bf16
        + 2 * h_out * w_out * c * 4    # out (double-buffered)
        + (1 << 20))                   # slack


@functools.partial(jax.jit, static_argnames=("out_hw", "norm", "depth_mode",
                                             "interpret"))
def fused_preprocess(frames, params, *, out_hw, norm=True, depth_mode=False,
                     interpret=False):
    """frames: uint8/f32 [B, H, W, C] -> f32 [B, h, w, C].

    params: [B, 8] from identity_params/augment_params.
    depth_mode: C must be 1; applies out_scale instead of normalization.
    """
    b, h_in, w_in, c = frames.shape
    h_out, w_out = out_hw
    kernel = functools.partial(
        _preprocess_kernel, in_hw=(h_in, w_in), out_hw=out_hw, channels=c,
        norm=norm, depth_mode=depth_mode)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # params [B, 8] lands in SMEM, prefetched
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h_in, w_in * c), lambda i, _p: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_out, w_out * c), lambda i, _p: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out * c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(_vmem_bytes((h_in, w_in), out_hw, c),
                                 128 * 1024 * 1024)),
        interpret=interpret,
    )(params, frames.reshape(b, h_in, w_in * c))
    return out.reshape(b, h_out, w_out, c)


# ---------------------------------------------------------------------------
# v2: weight matrices precomputed in XLA, DMA'd in — the kernel is two pure
# MXU matmuls + VPU affine (docs/design.md §2 "next lever if revisited").
# ---------------------------------------------------------------------------

def _preprocess_kernel_v2(p_ref, x_ref, ay_ref, t_ref, o_ref, *, channels,
                          norm, depth_mode):
    """Same math as _preprocess_kernel, but Ay/T arrive as operands.

    Trades the in-kernel VPU weight construction (1.84 M iota/compare
    elements per frame for the interleaved kron matrix) for an HBM DMA of
    the precomputed matrices (~4 µs/frame at v5e HBM bandwidth vs ~12 µs
    of VPU work) — the diagnosis in docs/design.md §2."""
    c = channels
    i = pl.program_id(0)
    out_scale = p_ref[i, 4]
    brightness, contrast, photo = p_ref[i, 5], p_ref[i, 6], p_ref[i, 7]

    ay = ay_ref[0]                      # [h_out, h_in] f32
    t = t_ref[0]                        # [w_in*c, w_out*c] bf16
    x = x_ref[0]
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.int32)
    x = x.astype(jnp.float32)
    if depth_mode:
        v = ((x > ref.DEPTH_EPS) & (x <= ref.MAKE3D_DEPTH_CAP)).astype(
            jnp.float32)
        x = x * v
    r = jnp.dot(ay, x, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    z = jnp.dot(r.astype(jnp.bfloat16), t,
                preferred_element_type=jnp.float32)

    if depth_mode:
        rv = jnp.dot(ay, v, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        zv = jnp.dot(rv.astype(jnp.bfloat16), t,
                     preferred_element_type=jnp.float32)
        d = z / jnp.maximum(zv, 1e-6)
        o_ref[0] = jnp.where(zv >= ref.DEPTH_VALID_RESAMPLE_THRESH,
                             d * out_scale, 0.0)
        return

    h_out, wc = z.shape
    if norm:
        col_ch = jax.lax.broadcasted_iota(jnp.int32, (h_out, wc), 1) % c
        s = [1.0 / (255.0 * sd) for sd in ref.RGB_STD]
        b = [-m / sd for m, sd in zip(ref.RGB_MEAN, ref.RGB_STD)]
        scale = jnp.where(col_ch == 0, s[0],
                          jnp.where(col_ch == 1, s[1], s[2]))
        bias = jnp.where(col_ch == 0, b[0],
                         jnp.where(col_ch == 1, b[1], b[2]))
        n = z * scale + bias
    else:
        n = z / 255.0
    m = jnp.mean(n)
    jittered = (n - m) * contrast + m + brightness
    o_ref[0] = jnp.where(photo > 0.5, jittered, n)


def _vmem_bytes_v2(in_hw, out_hw, c):
    h_in, w_in = in_hw
    h_out, w_out = out_hw
    return int(
        2 * h_in * w_in * c            # u8 input block (double-buffered)
        + h_in * w_in * c * 4          # f32 X
        + 2 * h_out * h_in * 4         # Ay operand (double-buffered)
        + 2 * w_in * w_out * c * c * 2  # T bf16 operand (double-buffered)
        + h_out * w_in * c * 4         # R f32 (+bf16 copy /2)
        + h_out * w_in * c * 2
        + 2 * h_out * w_out * c * 4    # out (double-buffered)
        + (1 << 20))


@functools.partial(jax.jit, static_argnames=("out_hw", "norm", "depth_mode",
                                             "interpret"))
def fused_preprocess_v2(frames, params, *, out_hw, norm=True,
                        depth_mode=False, interpret=False):
    """fused_preprocess with XLA-precomputed per-example weight matrices.

    Identical semantics/signature; see _preprocess_kernel_v2."""
    b, h_in, w_in, c = frames.shape
    h_out, w_out = out_hw
    g = geometry_of(params)
    ay = jax.vmap(
        lambda s, sc: triangle_matrix(h_out, h_in, s, sc))(
        g["y_start"], g["y_scale"])
    t = jax.vmap(
        lambda s, sc: triangle_matrix_interleaved(w_in, w_out, c, s, sc))(
        g["x_start"], g["x_scale"]).astype(jnp.bfloat16)

    kernel = functools.partial(
        _preprocess_kernel_v2, channels=c, norm=norm, depth_mode=depth_mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h_in, w_in * c), lambda i, _p: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_out, h_in), lambda i, _p: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_in * c, w_out * c), lambda i, _p: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_out, w_out * c), lambda i, _p: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out * c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(_vmem_bytes_v2((h_in, w_in), out_hw, c),
                                 128 * 1024 * 1024)),
        interpret=interpret,
    )(params, frames.reshape(b, h_in, w_in * c), ay, t)
    return out.reshape(b, h_out, w_out, c)


# ---------------------------------------------------------------------------
# Oracle (pure XLA, same math) — parity target and CPU fallback.
# ---------------------------------------------------------------------------

def oracle_preprocess(frames, params, *, out_hw, norm=True, depth_mode=False,
                      precision=jax.lax.Precision.HIGHEST):
    """Reference implementation of exactly the kernel's math in plain jnp.

    precision: HIGHEST by default (the parity/test oracle must not truncate
    f32 matmul operands). The training path may pass a lower precision —
    the model computes in bf16 anyway, so exact-f32 resize is wasted MXU
    passes there.
    """
    b, h_in, w_in, c = frames.shape
    h_out, w_out = out_hw
    g = geometry_of(params)

    hi = precision

    def one(frame, y_start, y_scale, x_start, x_scale, out_scale, brightness,
            contrast, photo):
        ay = triangle_matrix(h_out, h_in, y_start, y_scale)
        ax = triangle_matrix(w_out, w_in, x_start, x_scale)
        x = frame.astype(jnp.float32)
        if depth_mode:
            v = ((x > ref.DEPTH_EPS) & (x <= ref.MAKE3D_DEPTH_CAP)).astype(
                jnp.float32)
            x = x * v
        z = jnp.einsum("oh,hwc->owc", ay, x, precision=hi)
        z = jnp.einsum("pw,owc->opc", ax, z, precision=hi)
        if depth_mode:
            zv = jnp.einsum("oh,hwc->owc", ay, v, precision=hi)
            zv = jnp.einsum("pw,owc->opc", ax, zv, precision=hi)
            d = z / jnp.maximum(zv, 1e-6)
            return jnp.where(zv >= ref.DEPTH_VALID_RESAMPLE_THRESH,
                             d * out_scale, 0.0)
        if norm:
            mean = jnp.asarray(ref.RGB_MEAN, jnp.float32)
            std = jnp.asarray(ref.RGB_STD, jnp.float32)
            n = (z / 255.0 - mean) / std
        else:
            n = z / 255.0
        m = jnp.mean(n)
        jit_ = (n - m) * contrast + m + brightness
        return jnp.where(photo > 0.5, jit_, n)

    return jax.vmap(one)(frames, g["y_start"], g["y_scale"], g["x_start"],
                         g["x_scale"], g["out_scale"], g["brightness"],
                         g["contrast"], g["photo"])


def oracle_preprocess_s2d(frames, params, *, out_hw, factor=4,
                          precision=jax.lax.Precision.DEFAULT,
                          out_dtype=jnp.bfloat16):
    """RGB preprocess emitting the space-to-depth layout directly.

    Identical math to `oracle_preprocess(norm=True)` followed by
    `models.encdec.space_to_depth(x, factor)` and a cast to `out_dtype` —
    but the row/column resize matmuls carry the (dy, dx) sub-pixel axes as
    separate einsum output dims, so the stem's reshape-transpose relayout
    and the separate bf16 cast pass never exist as HBM copies (they were
    ~180 us/step at b16 — docs/design.md §2b, the "emit the s2d layout
    directly" lever).

    Output: [B, h/f, w/f, f*f*C] with channel index dy*(f*C) + dx*C + ch,
    exactly `space_to_depth`'s layout.
    """
    b, h_in, w_in, c = frames.shape
    h_out, w_out = out_hw
    f = factor
    assert h_out % f == 0 and w_out % f == 0, (out_hw, f)
    g = geometry_of(params)
    mean = jnp.asarray(ref.RGB_MEAN, jnp.float32)
    std = jnp.asarray(ref.RGB_STD, jnp.float32)

    def one(frame, y_start, y_scale, x_start, x_scale, brightness,
            contrast, photo):
        ay = triangle_matrix(h_out, h_in, y_start, y_scale)
        ax = triangle_matrix(w_out, w_in, x_start, x_scale)
        x = frame.astype(jnp.float32)
        z = jnp.einsum("qdh,hwc->qdwc", ay.reshape(h_out // f, f, h_in), x,
                       precision=precision)
        z = jnp.einsum("pew,qdwc->qpdec", ax.reshape(w_out // f, f, w_in), z,
                       precision=precision)
        n = (z / 255.0 - mean) / std
        m = jnp.mean(n)
        jit_ = (n - m) * contrast + m + brightness
        out = jnp.where(photo > 0.5, jit_, n)
        return out.reshape(h_out // f, w_out // f, f * f * c)

    out = jax.vmap(one)(frames, g["y_start"], g["y_scale"], g["x_start"],
                        g["x_scale"], g["brightness"], g["contrast"],
                        g["photo"])
    return out.astype(out_dtype)
