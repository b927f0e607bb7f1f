"""Int8 serving-path quantization (ops/quant.py): numerics and
param-compatibility with the bf16 training path."""

import jax
import jax.numpy as jnp
import numpy as np

from ann3depth_tpu.ops import quant


def test_qconv_close_to_f32_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 8, 16)), jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = quant.qconv(x, k)
    # symmetric 8-bit quant of both operands: ~1% relative error budget
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.03 * scale)


def test_quantize_sym_roundtrip_bounds():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 3, (64, 32)), jnp.float32)
    q, s = quant.quantize_sym(x)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    assert err.max() <= float(s) * 0.5 + 1e-6  # within half a quant step


def test_qconv_per_channel_scales():
    """A channel with tiny weights must not be flattened by a global
    scale — per-output-channel scales keep it accurate."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 4)), jnp.float32)
    k = np.zeros((1, 1, 4, 2), np.float32)
    k[..., 0] = rng.normal(0, 10.0, (1, 1, 4))   # big channel
    k[..., 1] = rng.normal(0, 0.01, (1, 1, 4))   # tiny channel
    want = jax.lax.conv_general_dilated(
        x, jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = quant.qconv(x, jnp.asarray(k))
    for c in range(2):
        w, g = np.asarray(want)[..., c], np.asarray(got)[..., c]
        np.testing.assert_allclose(g, w, atol=0.03 * np.abs(w).max())


def test_encdec_int8_shares_param_tree_and_stays_close():
    """quant='int8' runs the UNCONVERTED bf16-training param tree and its
    log-depth output stays within quantization noise of the bf16 path."""
    from ann3depth_tpu.models.encdec import EncDecDepthNet
    from ann3depth_tpu.train import step as steplib

    m_bf = EncDecDepthNet()
    m_q = EncDecDepthNet(quant="int8")
    params = steplib.init_params(m_bf, (48, 64), seed=0)
    # identical tree structure (QConv is param-compatible with nn.Conv)
    q_params = steplib.init_params(m_q, (48, 64), seed=0)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(q_params))

    x = jnp.asarray(np.random.default_rng(3).normal(0, 1, (2, 48, 64, 3)),
                    jnp.float32)
    y_bf = jax.jit(m_bf.apply)({"params": params}, x)
    y_q = jax.jit(m_q.apply)({"params": params}, x)
    d = np.abs(np.asarray(y_q) - np.asarray(y_bf))
    # log-depth divergence ~exp-scale relative depth error; <15% worst-case
    assert float(d.mean()) < 0.05 and float(d.max()) < 0.15, (
        d.mean(), d.max())


def test_qmatmul_close_to_f32():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (5, 7, 24)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.3, (24, 16)), jnp.float32)
    want = x @ k
    got = quant.qmatmul(x, k)
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.03 * scale)


def test_dpt_int8_shares_param_tree_and_stays_close():
    """DPT quant='int8' (QDense MLP + QMultiHeadAttention) runs the
    UNCONVERTED bf16 param tree; log-depth stays within quant noise."""
    from ann3depth_tpu.models.dpt import DPTDepthNet
    from ann3depth_tpu.train import step as steplib

    kw = dict(dim=64, depth=4, heads=2, fusion_features=32,
              tap_layers=(0, 1, 2, 3), remat=False)
    m_bf = DPTDepthNet(**kw)
    m_q = DPTDepthNet(**kw, quant="int8")
    params = steplib.init_params(m_bf, (32, 32), seed=0)
    q_params = steplib.init_params(m_q, (32, 32), seed=0)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(q_params))
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(q_params)[0]):
        assert p1 == p2 and a.shape == b.shape and a.dtype == b.dtype, (
            p1, a.shape, b.shape)

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    y_bf = m_bf.apply({"params": params}, x)
    y_q = m_q.apply({"params": params}, x)
    d = np.abs(np.asarray(y_q, np.float32) - np.asarray(y_bf, np.float32))
    # 3 blocks of int8 projections on bf16 activations: small log-depth
    # divergence (the encdec int8 budget scaled for depth-3)
    assert d.mean() < 0.05, d.mean()
    assert d.max() < 0.5, d.max()


def test_fake_quant_matches_int8_grid_with_identity_grad():
    """fake_quant's forward is the dequantized int8 grid; its gradient is
    exact identity (STE — nothing clips under dynamic scales)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))

    q, scale = quant.quantize_sym(x)
    np.testing.assert_allclose(np.asarray(quant.fake_quant(x)),
                               np.asarray(q.astype(np.float32) * scale),
                               rtol=0, atol=1e-7)

    g = jax.grad(lambda v: jnp.sum(quant.fake_quant(v) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0, rtol=0, atol=0)


def test_qconv_fake_matches_qconv_forward_with_real_grads():
    """The QAT conv forward tracks the int8 conv (same quantization grid,
    f32 vs int32 accumulation) and carries real gradients — unlike qconv,
    whose round() zeroes them."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32) * 0.2)

    y_int8 = quant.qconv(x, k)
    y_fake = quant.qconv_fake(x, k)
    np.testing.assert_allclose(np.asarray(y_fake), np.asarray(y_int8),
                               rtol=1e-5, atol=1e-4)

    gk = jax.grad(lambda kk: jnp.sum(quant.qconv_fake(x, kk) ** 2))(k)
    gk_int8 = jax.grad(lambda kk: jnp.sum(quant.qconv(x, kk) ** 2))(k)
    # STE grads are dense; qconv's round() zeroes everything except the
    # per-output-channel scale path (gradient only at each channel's
    # max-|w| entry) — useless for training.
    dense = int(jnp.sum(jnp.abs(gk) > 0))
    sparse = int(jnp.sum(jnp.abs(gk_int8) > 0))
    assert dense > 0.9 * k.size, (dense, k.size)
    assert sparse <= k.shape[-1], (sparse, k.shape[-1])


def test_encdec_qat_trains_and_serves_int8_unchanged():
    """int8-qat end-to-end: the QAT encdec trains (loss decreases), its
    param tree is identical to the bf16/int8 graphs, and the int8 serving
    forward of the QAT-trained params matches the QAT forward closely
    (the whole point: train-time forward == serve-time forward)."""
    import dataclasses

    from ann3depth_tpu.config import ModelConfig
    from ann3depth_tpu.models import registry
    from ann3depth_tpu.train import step as steplib

    hw = (48, 64)
    cfg_qat = ModelConfig(name="encdec", compute_dtype="float32",
                          quant="int8-qat")
    model = registry.build(cfg_qat)
    params = steplib.init_params(model, hw, seed=0)

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (4, 56, 72, 3), dtype=np.uint8)
    dep = rng.uniform(1.0, 50.0, (4, 24, 32)).astype(np.float32)
    tx = steplib.make_optimizer(1e-3)
    state = steplib.TrainState.create(model.apply, params, tx)
    losses = []
    key = jax.random.key(0)
    for _ in range(8):
        state, m = steplib.train_step(
            state, img, dep, key, input_hw=hw, target_hw=(24, 32),
            si_lambda=0.5)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses  # STE gradients actually train

    # same tree -> int8 serving graph restores the QAT params unchanged
    int8_model = registry.build(dataclasses.replace(cfg_qat, quant="int8"))
    x = jnp.asarray(rng.normal(size=(2, *hw, 3)).astype(np.float32))
    y_qat = model.apply({"params": state.params}, x)
    y_int8 = int8_model.apply({"params": state.params}, x)
    np.testing.assert_allclose(np.asarray(y_int8), np.asarray(y_qat),
                               rtol=1e-3, atol=5e-3)


def test_registry_rejects_qat_outside_encdec():
    import pytest

    from ann3depth_tpu.config import ModelConfig
    from ann3depth_tpu.models import registry

    with pytest.raises(ValueError, match="encdec-only"):
        registry.build(ModelConfig(name="dpt", quant="int8-qat"))


def test_registry_quant_covers_the_dpt_family():
    """dpt-small builds the same QDense/QMultiHeadAttention twin as dpt
    (its ctor threads quant); 'small' has no quantized twin and must
    fail loudly."""
    import pytest

    from ann3depth_tpu.config import ModelConfig
    from ann3depth_tpu.models import registry

    model = registry.build(ModelConfig(name="dpt-small", quant="int8"))
    assert getattr(model, "quant", "none") == "int8"
    with pytest.raises(ValueError, match="only supported"):
        registry.build(ModelConfig(name="small", quant="int8"))
