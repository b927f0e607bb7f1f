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
