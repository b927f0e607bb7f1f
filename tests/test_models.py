"""Model shape/golden tests (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu.config import ModelConfig
from ann3depth_tpu.models import registry
from ann3depth_tpu.train import step as steplib


@pytest.mark.parametrize("name,hw,out_hw", [
    ("small", (240, 320), (30, 40)),
    ("encdec", (240, 320), (120, 160)),
    ("small", (96, 128), (12, 16)),
    ("encdec", (96, 128), (48, 64)),
    ("multiscale", (240, 320), (120, 160)),
    ("multiscale", (96, 128), (48, 64)),
])
def test_output_shapes(name, hw, out_hw):
    cfg = ModelConfig(name=name, compute_dtype="float32")
    model = registry.build(cfg)
    params = steplib.init_params(model, hw)
    x = jnp.zeros((2, *hw, 3), jnp.float32)
    y = model.apply({"params": params}, x)
    assert y.shape == (2, *out_hw, 1)
    assert y.dtype == jnp.float32
    assert registry.output_hw(name, hw) == out_hw


def test_registry_rejects_unknown():
    with pytest.raises(KeyError):
        registry.build(ModelConfig(name="nope"))


@pytest.mark.parametrize("name", ["small", "encdec", "multiscale"])
def test_forward_deterministic_golden(name):
    """Fixed-seed forward emits a stable fingerprint (golden test §4.3)."""
    cfg = ModelConfig(name=name, compute_dtype="float32")
    model = registry.build(cfg)
    params = steplib.init_params(model, (96, 128), seed=42)
    x = jnp.asarray(np.random.default_rng(7).normal(0, 1, (1, 96, 128, 3)),
                    jnp.float32)
    apply = jax.jit(model.apply)
    y1 = apply({"params": params}, x)
    y2 = apply({"params": params}, x)
    # jit forward is bitwise deterministic call-to-call (the golden contract)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # eager matches jit up to fusion reassociation (GroupNorm reductions)
    y3 = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y3), rtol=0.05, atol=0.02)
    assert np.all(np.isfinite(np.asarray(y1)))


@pytest.mark.parametrize("name", ["encdec", "multiscale"])
def test_accepts_pre_s2d_input(name):
    """forward(pre-s2d layout) is bitwise forward(rgb) — same ops after
    the stem, relayout done by the caller (emit_s2d preprocess path)."""
    from ann3depth_tpu.models.encdec import space_to_depth

    cfg = ModelConfig(name=name, compute_dtype="float32")
    model = registry.build(cfg)
    params = steplib.init_params(model, (96, 128), seed=0)
    x = jnp.asarray(np.random.default_rng(9).normal(0, 1, (2, 96, 128, 3)),
                    jnp.float32)
    y_rgb = jax.jit(model.apply)({"params": params}, x)
    y_s2d = jax.jit(model.apply)({"params": params}, space_to_depth(x, 4))
    np.testing.assert_array_equal(np.asarray(y_rgb), np.asarray(y_s2d))
    assert registry.s2d_input_factor(name) == 4


def test_multiscale_grads_flow_everywhere():
    """Every parameter tensor — both scales, the global-context MLP, both
    heads — receives gradient (dead-path detector for the two-branch
    residual topology)."""
    cfg = ModelConfig(name="multiscale", compute_dtype="float32")
    model = registry.build(cfg)
    params = steplib.init_params(model, (96, 128))
    x = jnp.asarray(np.random.default_rng(3).normal(0, 1, (1, 96, 128, 3)),
                    jnp.float32)

    def f(p):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    g = jax.grad(f)(params)
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g)]
    assert all(np.isfinite(norms))
    assert sum(n > 0 for n in norms) >= len(norms) - 2


def test_multiscale_coarse_carries_global_signal():
    """The fine residual sits ON TOP of the coarse map: zeroing the fine
    head's params must leave a prediction that still varies with the
    input (the coarse pathway alone carries signal) — the structural
    stage-wise coupling the model docstring claims."""
    cfg = ModelConfig(name="multiscale", compute_dtype="float32")
    model = registry.build(cfg)
    params = steplib.init_params(model, (96, 128), seed=1)
    params = jax.tree_util.tree_map_with_path(
        lambda path, l: jnp.zeros_like(l)
        if any(getattr(k, "key", "") == "fine_head" for k in path) else l,
        params)
    rng = np.random.default_rng(11)
    x1 = jnp.asarray(rng.normal(0, 1, (1, 96, 128, 3)), jnp.float32)
    x2 = jnp.asarray(rng.normal(0, 1, (1, 96, 128, 3)), jnp.float32)
    y1 = model.apply({"params": params}, x1)
    y2 = model.apply({"params": params}, x2)
    assert float(jnp.max(jnp.abs(y1 - y2))) > 1e-4


def test_encdec_bf16_params_stay_f32():
    cfg = ModelConfig(name="encdec", compute_dtype="bfloat16")
    model = registry.build(cfg)
    params = steplib.init_params(model, (96, 128))
    dtypes = {l.dtype for l in jax.tree.leaves(params)}
    assert dtypes == {jnp.dtype(jnp.float32)}
    y = model.apply({"params": params}, jnp.zeros((1, 96, 128, 3)))
    assert y.dtype == jnp.float32  # head runs f32


def test_encdec_grads_flow_everywhere():
    cfg = ModelConfig(name="encdec", compute_dtype="float32")
    model = registry.build(cfg)
    params = steplib.init_params(model, (96, 128))
    x = jnp.ones((1, 96, 128, 3))

    def f(p):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    g = jax.grad(f)(params)
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g)]
    assert all(np.isfinite(norms))
    # every parameter tensor receives some gradient (skips detect dead paths)
    assert sum(n > 0 for n in norms) >= len(norms) - 2


def test_dpt_fused_qkv_param_compatible_and_close():
    """attention_impl='fused' (one [E,3E] qkv matmul) shares the flax
    param tree exactly and matches the flax attention numerically."""
    from ann3depth_tpu.models.dpt import DPTDepthNet

    kw = dict(dim=64, depth=4, heads=2, fusion_features=32,
              tap_layers=(0, 1, 2, 3), remat=False,
              compute_dtype=jnp.float32)
    m_flax = DPTDepthNet(**kw)
    m_fused = DPTDepthNet(**kw, attention_impl="fused")
    params = steplib.init_params(m_flax, (32, 32), seed=0)
    f_params = steplib.init_params(m_fused, (32, 32), seed=0)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(f_params))
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(f_params)[0]):
        assert p1 == p2 and a.shape == b.shape and a.dtype == b.dtype, (
            p1, a.shape, b.shape)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    y_flax = m_flax.apply({"params": params}, x)
    y_fused = m_fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_flax),
                               rtol=1e-4, atol=1e-4)

    # gradients flow through every fused-attention parameter
    def f(p):
        return jnp.sum(m_fused.apply({"params": p}, x) ** 2)

    g = jax.grad(f)(params)
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) >= len(norms) - 2

    # from-scratch init scale matches flax DenseGeneral: fan_in of an
    # (E,H,D) qkv kernel is E, not H*E (bare lecun_normal would draw
    # ~sqrt(heads) too small — ops/quant.dense_general_init)
    def _qkv_kernel_stds(tree):
        out = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            keys = [getattr(k, "key", "") for k in path]
            if ("query" in keys or "key" in keys or "value" in keys) \
                    and keys[-1] == "kernel":
                out.append(float(jnp.std(leaf)))
        assert out
        return out

    for s_flax, s_fused in zip(_qkv_kernel_stds(params),
                               _qkv_kernel_stds(f_params)):
        assert 0.7 < s_fused / s_flax < 1.4, (s_flax, s_fused)
