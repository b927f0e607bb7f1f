"""Loss/metric unit tests vs hand-computed numpy oracles (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu.train import losses


def _np_si_loss(pred_log, target, lam=0.5):
    """Per-image Eigen et al. eq.4 oracle in plain numpy."""
    out = []
    for p, t in zip(pred_log, target):
        valid = (t > 1e-6) & (t <= 70.0)
        d = (p - np.log(np.maximum(t, 1e-6)))[valid]
        n = max(d.size, 1)
        out.append((d ** 2).sum() / n - lam * d.sum() ** 2 / n ** 2)
    return float(np.mean(out))


def test_si_loss_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    target = rng.uniform(1.0, 60.0, (4, 8, 10)).astype(np.float32)
    pred_log = np.log(target) + rng.normal(0, 0.3, target.shape).astype(np.float32)
    got = float(losses.scale_invariant_log_loss(jnp.asarray(pred_log), jnp.asarray(target)))
    want = _np_si_loss(pred_log, target)
    assert got == pytest.approx(want, rel=1e-5)


def test_si_loss_zero_at_perfect_prediction():
    target = np.full((2, 4, 4), 10.0, np.float32)
    pred_log = np.log(target)
    assert float(losses.scale_invariant_log_loss(pred_log, target)) == pytest.approx(0.0, abs=1e-6)


def test_si_loss_scale_invariance():
    """With lam=1, a global scale on predictions leaves the loss unchanged."""
    rng = np.random.default_rng(1)
    target = rng.uniform(1.0, 50.0, (2, 6, 6)).astype(np.float32)
    pred_log = np.log(target) + rng.normal(0, 0.2, target.shape).astype(np.float32)
    l1 = float(losses.scale_invariant_log_loss(pred_log, target, lam=1.0))
    l2 = float(losses.scale_invariant_log_loss(pred_log + 0.7, target, lam=1.0))
    assert l1 == pytest.approx(l2, rel=1e-4)


def test_si_loss_masks_invalid_depth():
    target = np.full((1, 4, 4), 10.0, np.float32)
    pred_log = np.log(target)
    target[0, 0, 0] = 0.0     # invalid (no laser return)
    target[0, 1, 1] = 100.0   # beyond depth cap
    pred_log[0, 0, 0] = 5.0   # wildly wrong at masked pixels must not matter
    pred_log[0, 1, 1] = -3.0
    assert float(losses.scale_invariant_log_loss(pred_log, target)) == pytest.approx(0.0, abs=1e-6)


def test_si_loss_4d_pred_shape():
    """Model outputs [B,h,w,1]; loss must accept that against [B,h,w]."""
    target = np.full((2, 4, 4), 5.0, np.float32)
    pred = np.log(target)[..., None]
    assert float(losses.scale_invariant_log_loss(pred, target)) == pytest.approx(0.0, abs=1e-6)


def test_depth_metrics_oracle():
    rng = np.random.default_rng(2)
    target = rng.uniform(2.0, 40.0, (2, 8, 8)).astype(np.float32)
    pred = target * 1.1  # uniform 10% overestimate
    m = {k: float(v) for k, v in losses.depth_metrics(np.log(pred), target).items()}
    assert m["abs_rel"] == pytest.approx(0.1, rel=1e-3)
    assert m["delta1"] == pytest.approx(1.0)  # 1.1 < 1.25
    want_rmse = float(np.sqrt(np.mean((pred - target) ** 2)))
    assert m["rmse"] == pytest.approx(want_rmse, rel=1e-4)
    assert m["rmse_log"] == pytest.approx(abs(np.log(1.1)), rel=1e-3)


def test_metrics_gradient_free_usage():
    """Loss must be differentiable; metrics needn't be."""
    import jax
    target = jnp.full((1, 4, 4), 10.0)
    g = jax.grad(lambda p: losses.scale_invariant_log_loss(p, target))(
        jnp.zeros((1, 4, 4)))
    assert np.all(np.isfinite(np.asarray(g)))
