"""Depth losses and error metrics.

Scale-invariant log-depth loss per BASELINE.json:5 (Eigen et al. 2014,
"Depth Map Prediction from a Single Image using a Multi-Scale Deep Network",
eq. 4):  for d_i = log(pred_i) - log(gt_i) over valid pixels,

    L = (1/n) sum d_i^2  -  (lambda/n^2) (sum d_i)^2

Models in this framework predict *log-depth* directly (models/registry.py),
which keeps the loss a pure polynomial of the network output — no log/exp of
network outputs inside the backward pass, and no positivity constraint
needed. All reductions are mask-aware: Make3D laser depth has far-plane
saturation masked out (compat/reference_spec.py MAKE3D_DEPTH_CAP).

Everything here is shape-polymorphic pure jnp so it jits onto TPU and is
trivially differentiable; reductions are at f32 regardless of compute dtype.
"""

from __future__ import annotations

import jax.numpy as jnp

from ann3depth_tpu.compat import reference_spec as ref


def _flatten_mask(target, mask):
    """Valid-pixel mask: provided mask AND target within (eps, cap]."""
    valid = (target > ref.DEPTH_EPS) & (target <= ref.MAKE3D_DEPTH_CAP)
    if mask is not None:
        valid &= mask.astype(bool)
    return valid


def scale_invariant_log_loss(pred_log, target, mask=None, lam=ref.SI_LOSS_LAMBDA):
    """Scale-invariant loss on log-depth predictions.

    Args:
      pred_log: [..., H, W] or [..., H, W, 1] predicted log-depth.
      target:   same shape, *linear* depth in meters (ground truth).
      mask:     optional bool same shape; False pixels are ignored.
      lam:      the lambda in Eigen et al. eq. 4 (0 -> plain log-L2,
                1 -> fully scale-invariant).

    Returns: scalar f32 loss (mean over batch of per-image losses).
    """
    pred_log = jnp.asarray(pred_log, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if pred_log.shape != target.shape:
        pred_log = pred_log.reshape(target.shape)
    valid = _flatten_mask(target, mask)

    d = jnp.where(valid, pred_log - jnp.log(jnp.maximum(target, ref.DEPTH_EPS)), 0.0)
    # Per-image reduction (sum over spatial dims), then mean over batch —
    # matches the per-example form of Eigen eq. 4.
    axes = tuple(range(1, d.ndim))
    n = jnp.maximum(jnp.sum(valid, axis=axes).astype(jnp.float32), 1.0)
    s1 = jnp.sum(d * d, axis=axes)
    s2 = jnp.sum(d, axis=axes)
    per_image = s1 / n - lam * (s2 * s2) / (n * n)
    return jnp.mean(per_image)


def depth_metrics(pred_log, target, mask=None):
    """Standard monocular-depth error metrics (eval surface, [B:2]).

    Returns dict of scalars: rmse (linear, meters), rmse_log, abs_rel,
    log10, delta1/2/3 accuracy. All mask-aware, f32.
    """
    pred_log = jnp.asarray(pred_log, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    if pred_log.shape != target.shape:
        pred_log = pred_log.reshape(target.shape)
    valid = _flatten_mask(target, mask)
    n = jnp.maximum(jnp.sum(valid).astype(jnp.float32), 1.0)

    tgt = jnp.maximum(target, ref.DEPTH_EPS)
    pred = jnp.exp(pred_log)
    z = jnp.where(valid, 1.0, 0.0)

    diff = (pred - tgt) * z
    rmse = jnp.sqrt(jnp.sum(diff * diff) / n)

    dlog = (pred_log - jnp.log(tgt)) * z
    rmse_log = jnp.sqrt(jnp.sum(dlog * dlog) / n)

    abs_rel = jnp.sum(jnp.abs(pred - tgt) / tgt * z) / n
    log10 = jnp.sum(jnp.abs(dlog) * z) / jnp.log(10.0) / n

    ratio = jnp.maximum(pred / tgt, tgt / jnp.maximum(pred, ref.DEPTH_EPS))
    deltas = {
        f"delta{i}": jnp.sum((ratio < 1.25**i) & valid) / n for i in (1, 2, 3)
    }
    return {
        "rmse": rmse,
        "rmse_log": rmse_log,
        "abs_rel": abs_rel,
        "log10": log10,
        **deltas,
    }
