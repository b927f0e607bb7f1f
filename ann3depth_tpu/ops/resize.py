"""Resampling weight math shared by the XLA oracle and the Pallas kernel.

A 1-D resize (with optional antialiasing, cropping, and mirroring) is a
dense matmul `out = W @ in` where W[o, i] is a normalized triangle kernel

    src(o) = start + (o + 0.5) * scale - 0.5          # half-pixel centers
    r      = max(|scale|, 1)                           # antialias radius
    W[o,i] = max(0, 1 - |src(o) - i| / r);  W /= W.sum(axis=1)

This is exactly `jax.image.resize(method="bilinear")` semantics when
start=0, scale=in/out (antialiased triangle on downsample, 2-tap on
upsample), verified in tests/test_pallas_preprocess.py. Crop = change
(start, scale) to the source window; horizontal flip = negative scale with
start at the right edge. Everything stays a matmul -> MXU-friendly, no
gathers (SURVEY §7.3 hard-part 1).

All functions are pure jnp: usable inside Pallas kernels (iota is
broadcasted_iota-compatible 2D) and in plain XLA (vmappable per example).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def window_params(in_size, out_size, *, crop_start=None, crop_frac=1.0,
                  flip=None):
    """(start, scale) for resampling a source window to out_size.

    crop_start: scalar/array in [0,1] — normalized position of the crop
      window within the slack (None -> full frame).
    crop_frac:  window size as a fraction of the source (1.0 = full).
    flip:       bool scalar/array — mirror the window.

    Returns (start, scale) broadcastable scalars/arrays, where
    src(o) = start + (o + 0.5) * scale - 0.5.
    """
    win = in_size * crop_frac
    scale = win / out_size
    if crop_start is None:
        off = (in_size - win) * 0.5  # centered window (0 when frac=1)
    else:
        off = crop_start * (in_size - win)
    start = off
    if flip is not None:
        flip = jnp.asarray(flip)
        # Mirrored window: with src(o) = start + (o+0.5)*scale - 0.5, the
        # reversed output equals negative scale anchored at the window's
        # right edge:  src'(o) = (off+win) + (o+0.5)*(-scale) - 0.5.
        start = jnp.where(flip, off + win, start)
        scale = jnp.where(flip, -scale, scale)
    return jnp.asarray(start, jnp.float32), jnp.asarray(scale, jnp.float32)


def triangle_matrix(out_size: int, in_size: int, start, scale):
    """Dense [out_size, in_size] row-normalized triangle resize matrix.

    start/scale are (traced) scalars; shapes are static. Works inside
    Pallas (2-D iota only) and in XLA.
    """
    # int32 iota then cast: Mosaic's tpu.iota is integer-only.
    o_ids = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, in_size), 0).astype(jnp.float32)
    i_ids = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, in_size), 1).astype(jnp.float32)
    src = start + (o_ids + 0.5) * scale - 0.5
    r = jnp.maximum(jnp.abs(scale), 1.0)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src - i_ids) / r)
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-8)


def triangle_matrix_interleaved(in_size: int, out_size: int, channels: int,
                                start, scale):
    """[in_size*C, out_size*C] column-resize matrix for channel-interleaved
    rows: (R [h, in*C]) @ M -> [h, out*C], i.e. kron(Ax^T, I_C).

    Built directly with 2-D iota (no kron materialization steps) so it runs
    inside a Pallas kernel. Rows index the interleaved *input* columns
    (position = k // C, channel = k % C); columns index the output.
    """
    k = jax.lax.broadcasted_iota(
        jnp.int32, (in_size * channels, out_size * channels), 0)
    j = jax.lax.broadcasted_iota(
        jnp.int32, (in_size * channels, out_size * channels), 1)
    k_pos, k_ch = (k // channels).astype(jnp.float32), k % channels
    j_pos, j_ch = (j // channels).astype(jnp.float32), j % channels
    src = start + (j_pos + 0.5) * scale - 0.5
    r = jnp.maximum(jnp.abs(scale), 1.0)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src - k_pos) / r)
    w = jnp.where(k_ch == j_ch, w, 0.0)
    return w / jnp.maximum(jnp.sum(w, axis=0, keepdims=True), 1e-8)


def upsample_matmul(x, factor: int = 2, precision=None):
    """Bilinear integer-factor upsample of [B, H, W, C] as two fixed matmuls.

    Mathematically identical to `jax.image.resize(..., "bilinear")` at an
    exact integer factor (half-pixel centers, scale=1/f), but expressed as
    einsum dots so XLA keeps the surrounding NHWC layout instead of
    inserting transposes around a gather-based resize (measured ~80 us/step
    of copies at encdec b16 — docs/design.md §2b). Runs in x.dtype.

    precision None -> HIGHEST for f32 inputs (DEFAULT would truncate the
    operands, and the DP-equality tests need partition-invariant f32 math);
    bf16 inputs run native MXU bf16 where the flag is moot.
    """
    b, h, w, c = x.shape
    f = factor
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
    ay = triangle_matrix(h * f, h, 0.0, 1.0 / f).astype(x.dtype)
    ax = triangle_matrix(w * f, w, 0.0, 1.0 / f).astype(x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", ay, x, precision=precision)
    return jnp.einsum("pw,bowc->bopc", ax, y, precision=precision)


def upsample2x_matmul(x, precision=None):
    """Bilinear x2 upsample as two fixed matmuls (see upsample_matmul)."""
    return upsample_matmul(x, 2, precision=precision)


def resample_2d(x, out_hw, y_start=0.0, y_scale=None, x_start=0.0,
                x_scale=None):
    """Oracle 2-D resample of [H, W, C] via two einsum matmuls."""
    h_in, w_in, c = x.shape
    h_out, w_out = out_hw
    if y_scale is None:
        y_scale = h_in / h_out
    if x_scale is None:
        x_scale = w_in / w_out
    ay = triangle_matrix(h_out, h_in, y_start, y_scale)
    ax = triangle_matrix(w_out, w_in, x_start, x_scale)
    # HIGHEST: the default dot precision truncates f32 operands (bf16-ish)
    # on both TPU and current XLA:CPU — unacceptable for a resize oracle.
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,hwc->owc", ay, x.astype(jnp.float32), precision=hi)
    return jnp.einsum("pw,owc->opc", ax, y, precision=hi)
