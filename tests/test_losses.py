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
    # KITTI-set extras: sq_rel = mean((p-t)^2/t) = 0.01*mean(t) here;
    # a CONSTANT log error has zero variance, so SILog ~ 0
    assert m["sq_rel"] == pytest.approx(0.01 * float(target.mean()),
                                        rel=1e-3)
    assert m["silog"] == pytest.approx(0.0, abs=1e-3)


def test_silog_matches_numpy_variance_oracle():
    rng = np.random.default_rng(5)
    target = rng.uniform(1.0, 50.0, (3, 8, 8)).astype(np.float32)
    pred_log = np.log(target) + rng.normal(0, 0.2, target.shape).astype(
        np.float32)
    m = {k: float(v) for k, v in losses.depth_metrics(pred_log,
                                                      target).items()}
    dlog = pred_log - np.log(target)
    assert m["silog"] == pytest.approx(float(dlog.std()), rel=1e-3)
    assert m["sq_rel"] == pytest.approx(
        float(np.mean((np.exp(pred_log) - target) ** 2 / target)), rel=1e-3)


def test_global_accumulation_equals_numpy_oracle():
    """Summed depth_metric_stats over batches + one finalize == metrics over
    the concatenated split (reference_spec.EVAL_ACCUMULATION). Batches get
    different valid-pixel counts so the old per-batch mean-of-means would
    NOT equal the dataset metric — asserted at the end."""
    rng = np.random.default_rng(3)
    batches = []
    for b in range(3):
        t = rng.uniform(1.0, 60.0, (2, 6, 6)).astype(np.float32)
        t[:, : b + 2, : b + 2] = 100.0  # beyond cap -> invalid, size varies
        noise = rng.uniform(0.7, 1.4, t.shape).astype(np.float32)
        p = np.log(np.maximum(t * noise, 1e-6)).astype(np.float32)
        batches.append((p, t))

    totals = {}
    for p, t in batches:
        s = losses.depth_metric_stats(p, t, si_lambda=0.5)
        for k, v in s.items():
            totals[k] = totals.get(k, 0.0) + float(v)
    got = losses.finalize_depth_metrics(totals)

    P = np.concatenate([p for p, _ in batches])
    T = np.concatenate([t for _, t in batches])
    valid = (T > 1e-6) & (T <= 70.0)
    pred, tgt = np.exp(P[valid]), T[valid]
    dlog = P[valid] - np.log(tgt)
    ratio = np.maximum(pred / tgt, tgt / pred)
    # rel 1e-4: stats accumulate in f32 on device, the oracle runs f64
    assert got["rmse"] == pytest.approx(
        float(np.sqrt(np.mean((pred - tgt) ** 2))), rel=1e-4)
    assert got["rmse_log"] == pytest.approx(
        float(np.sqrt(np.mean(dlog ** 2))), rel=1e-4)
    assert got["abs_rel"] == pytest.approx(
        float(np.mean(np.abs(pred - tgt) / tgt)), rel=1e-4)
    assert got["log10"] == pytest.approx(
        float(np.mean(np.abs(dlog)) / np.log(10)), rel=1e-4)
    assert got["delta1"] == pytest.approx(float(np.mean(ratio < 1.25)), rel=1e-4)
    # eval loss = mean over ALL images of the per-image Eigen loss
    want_loss = float(np.mean([_np_si_loss(p, t) for p, t in batches]))
    assert got["loss"] == pytest.approx(want_loss, rel=1e-4)
    # the defect this replaces: mean of per-batch RMSEs != dataset RMSE
    per_batch = np.mean([float(losses.depth_metrics(p, t)["rmse"])
                         for p, t in batches])
    assert abs(got["rmse"] - per_batch) > 1e-3


def test_metrics_gradient_free_usage():
    """Loss must be differentiable; metrics needn't be."""
    import jax
    target = jnp.full((1, 4, 4), 10.0)
    g = jax.grad(lambda p: losses.scale_invariant_log_loss(p, target))(
        jnp.zeros((1, 4, 4)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_l2_loss_numpy_oracle():
    """per_image_l2_loss == mean squared LINEAR-depth error over valid
    pixels, per image (r3: the 'standard L2 variant' of SURVEY §2.1)."""
    rng = np.random.default_rng(0)
    target = rng.uniform(1.0, 50.0, (3, 6, 8)).astype(np.float32)
    pred_log = np.log(target) + rng.normal(0, 0.2, target.shape).astype(
        np.float32)

    got = np.asarray(losses.per_image_l2_loss(pred_log[..., None], target))
    want = np.mean((np.exp(pred_log) - target) ** 2, axis=(1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_berhu_loss_numpy_oracle_and_regimes():
    """BerHu == L1 below c, (r^2+c^2)/(2c) above, c = 0.2 max|r| per
    image; continuous at the cutoff."""
    rng = np.random.default_rng(1)
    target = rng.uniform(1.0, 50.0, (2, 5, 5)).astype(np.float32)
    pred_log = np.log(target) + rng.normal(0, 0.3, target.shape).astype(
        np.float32)

    got = np.asarray(losses.per_image_berhu_loss(pred_log[..., None],
                                                 target))
    r = np.abs(np.exp(pred_log) - target)
    c = 0.2 * r.reshape(2, -1).max(axis=1)[:, None, None]
    per_px = np.where(r <= c, r, (r * r + c * c) / (2 * c))
    want = per_px.mean(axis=(1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # both regimes actually exercised
    assert (r > c).any() and (r <= c).any()


def test_berhu_cutoff_is_not_differentiated():
    """The per-image cutoff c = 0.2*max|r| is a threshold, not a loss
    term: without stop_gradient, grad flows through jnp.max into the
    worst pixel's L2 branch with a NEGATIVE sign (d/dc of (a^2+c^2)/(2c)
    = (c^2-a^2)/(2c^2) < 0 for a > c), so training would push the worst
    residual FURTHER from ground truth."""
    import jax
    import jax.numpy as jnp

    # One image: a dominant residual (sets c) plus many above-cutoff
    # pixels whose L2 branch depends on c.
    target = np.full((1, 1, 101), 10.0, np.float32)
    pred = np.full((1, 1, 101), 13.0, np.float32)   # r = 3 everywhere
    pred[0, 0, 0] = 20.0                            # r = 10 -> c = 2

    def loss(pred_lin):
        return jnp.sum(losses.per_image_berhu_loss(
            jnp.log(pred_lin), jnp.asarray(target)))

    g = np.asarray(jax.grad(loss)(jnp.asarray(pred)))
    # Increasing the worst pixel's prediction (already above GT) must
    # increase the loss.
    assert g[0, 0, 0] > 0, f"worst-pixel gradient {g[0, 0, 0]} rewards " \
                           "growing the max residual (cutoff leaked grad)"
    # Ordinary above-cutoff pixels keep their positive gradient too.
    assert (g[0, 0, 1:] > 0).all()


def test_depth_loss_dispatch_and_unknown_kind():
    import pytest

    rng = np.random.default_rng(2)
    target = rng.uniform(1.0, 50.0, (2, 4, 4)).astype(np.float32)
    pred_log = np.log(target).astype(np.float32)

    # perfect prediction: every kind is ~0
    for kind in ("si", "l2", "berhu"):
        assert float(losses.depth_loss(pred_log, target, kind=kind)) == (
            pytest.approx(0.0, abs=1e-5))
    with pytest.raises(ValueError, match="unknown loss kind"):
        losses.depth_loss(pred_log, target, kind="huber")


def test_train_step_with_each_loss_kind_decreases():
    """The loss choice threads through the jitted step and actually
    trains (gradients flow through exp() for the linear-depth losses)."""
    import jax

    from ann3depth_tpu.config import ModelConfig
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.train import step as steplib

    hw = (48, 64)
    thw = registry.output_hw("small", hw)
    rng_np = np.random.default_rng(3)
    img = rng_np.integers(0, 256, (4, 56, 72, 3), dtype=np.uint8)
    dep = rng_np.uniform(1.0, 20.0, (4, 28, 36)).astype(np.float32)
    model = registry.build(ModelConfig(name="small",
                                       compute_dtype="float32"))
    key = jax.random.key(0)
    for kind in ("l2", "berhu"):
        params = steplib.init_params(model, hw, seed=0)
        tx = steplib.make_optimizer(3e-4)
        state = steplib.TrainState.create(model.apply, params, tx)
        first = last = None
        for _ in range(10):
            state, m = steplib.train_step(
                state, img, dep, key, input_hw=hw, target_hw=thw,
                si_lambda=0.5, loss_kind=kind)
            last = float(m["loss"])
            first = first if first is not None else last
        assert np.isfinite(last), kind
        assert last < first, (kind, first, last)


def test_cli_loss_flag_resolves():
    from ann3depth_tpu.cli import build_parser, _resolve

    args = build_parser().parse_args(
        ["train", "--config", "smoke", "--loss", "berhu"])
    assert _resolve(args).train.loss == "berhu"
    assert (_resolve(build_parser().parse_args(
        ["train", "--config", "smoke"])).train.loss == "si")


def test_grad_loss_numpy_oracle():
    """per_image_grad_loss vs a plain-numpy forward-difference oracle."""
    rng = np.random.default_rng(5)
    target = rng.uniform(1.0, 50.0, (2, 5, 6)).astype(np.float32)
    pred_log = (np.log(target)
                + rng.normal(0, 0.3, target.shape)).astype(np.float32)
    got = np.asarray(losses.per_image_grad_loss(pred_log, target))
    d = pred_log - np.log(target)
    for b in range(2):
        dx = d[b][:, 1:] - d[b][:, :-1]
        dy = d[b][1:, :] - d[b][:-1, :]
        want = ((dx ** 2).sum() + (dy ** 2).sum()) / (dx.size + dy.size)
        assert got[b] == pytest.approx(want, rel=1e-5)
    # channel-last target shape ([B,H,W,1], accepted by the sibling
    # losses) must hit the SAME spatial axes, not diff the channel dim
    got4 = np.asarray(losses.per_image_grad_loss(pred_log[..., None],
                                                 target[..., None]))
    np.testing.assert_allclose(got4, got, rtol=1e-6)


def test_grad_loss_zero_for_constant_log_offset():
    """A global scale error shifts every log pixel equally — zero
    depth-structure penalty (the property that makes the term a clean
    complement to the SI loss)."""
    rng = np.random.default_rng(6)
    target = rng.uniform(1.0, 50.0, (2, 4, 4)).astype(np.float32)
    pred_log = (np.log(target) + 0.7).astype(np.float32)
    got = np.asarray(losses.per_image_grad_loss(pred_log, target))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)
    # ...while plain si with lam<1 does penalize the offset
    assert float(losses.depth_loss(pred_log, target, kind="si")) > 0.01


def test_grad_loss_masked_pixels_create_no_edges():
    """An invalid pixel (above the Make3D cap) drops every neighbor pair
    it touches — a wild prediction there must not fabricate gradients."""
    rng = np.random.default_rng(7)
    target = rng.uniform(1.0, 50.0, (1, 4, 5)).astype(np.float32)
    target[0, 2, 3] = 200.0  # far-plane: invalid
    pred_log = np.log(np.minimum(target, 50.0)).astype(np.float32)
    pred_log[0, 2, 3] = 99.0  # garbage at the invalid pixel
    got = np.asarray(losses.per_image_grad_loss(pred_log, target))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_si_grad_kind_dispatch_and_training():
    """'si+grad' = si + grad term exactly; threads through the jitted
    train step and decreases."""
    import jax

    from ann3depth_tpu.config import ModelConfig
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.train import step as steplib

    rng = np.random.default_rng(8)
    target = rng.uniform(1.0, 50.0, (2, 4, 4)).astype(np.float32)
    pred_log = (np.log(target)
                + rng.normal(0, 0.2, target.shape)).astype(np.float32)
    want = (float(losses.depth_loss(pred_log, target, kind="si"))
            + float(np.mean(np.asarray(
                losses.per_image_grad_loss(pred_log, target)))))
    got = float(losses.depth_loss(pred_log, target, kind="si+grad"))
    assert got == pytest.approx(want, rel=1e-6)

    hw = (48, 64)
    thw = registry.output_hw("small", hw)
    img = rng.integers(0, 256, (4, 56, 72, 3), dtype=np.uint8)
    dep = rng.uniform(1.0, 20.0, (4, 28, 36)).astype(np.float32)
    model = registry.build(ModelConfig(name="small",
                                       compute_dtype="float32"))
    params = steplib.init_params(model, hw, seed=0)
    state = steplib.TrainState.create(model.apply, params,
                                      steplib.make_optimizer(3e-4))
    key = jax.random.key(0)
    first = last = None
    for _ in range(10):
        state, m = steplib.train_step(
            state, img, dep, key, input_hw=hw, target_hw=thw,
            si_lambda=0.5, loss_kind="si+grad")
        last = float(m["loss"])
        first = first if first is not None else last
    assert np.isfinite(last) and last < first, (first, last)

    from ann3depth_tpu.cli import _resolve, build_parser
    args = build_parser().parse_args(
        ["train", "--config", "smoke", "--loss", "si+grad"])
    assert _resolve(args).train.loss == "si+grad"


def test_silog_kitti_is_mean_per_image_silog_x100():
    """silog_kitti (r5): mean over images of each image's SILog, x100 —
    the KITTI leaderboard form, accumulated as its own sufficient
    statistic (NOT derivable from the pooled pixel sums)."""
    rng = np.random.default_rng(9)
    target = rng.uniform(1.0, 50.0, (4, 8, 8)).astype(np.float32)
    pred_log = np.log(target) + rng.normal(0, 0.3, target.shape).astype(
        np.float32)
    m = {k: float(v) for k, v in losses.depth_metrics(pred_log,
                                                      target).items()}
    per_img = [float((pred_log[i] - np.log(target[i])).std())
               for i in range(4)]
    assert m["silog_kitti"] == pytest.approx(100.0 * np.mean(per_img),
                                             rel=1e-3)
    # pooled form differs (per-image means subtract per image)
    assert m["silog"] != pytest.approx(m["silog_kitti"] / 100.0, rel=1e-4)
    # and it accumulates: stats summed over two halves == one-shot
    a = losses.depth_metric_stats(pred_log[:2], target[:2])
    b = losses.depth_metric_stats(pred_log[2:], target[2:])
    summed = {k: float(a[k]) + float(b[k]) for k in a}
    fin = losses.finalize_depth_metrics(summed)
    assert float(fin["silog_kitti"]) == pytest.approx(m["silog_kitti"],
                                                      rel=1e-5)
