"""Preprocess oracle tests vs scipy/PIL-style numpy references (SURVEY §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu.compat import reference_spec as ref
from ann3depth_tpu.pipeline import preprocess


def test_normalize_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (4, 4, 3)).astype(np.float32)
    y = preprocess.denormalize_rgb(preprocess.normalize_rgb(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-6)


def test_preprocess_image_shape_and_stats():
    img = np.full((1, 48, 64, 3), 255, np.uint8)
    out = preprocess.preprocess_image(jnp.asarray(img), (24, 32))
    assert out.shape == (1, 24, 32, 3)
    want = (1.0 - np.asarray(ref.RGB_MEAN)) / np.asarray(ref.RGB_STD)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], want, rtol=1e-5)


def test_resize_matches_pil_bilinear():
    """Half-pixel-center bilinear == PIL's BILINEAR (the scipy/PIL oracle)."""
    from PIL import Image
    rng = np.random.default_rng(1)
    src = rng.uniform(0, 255, (40, 56, 3)).astype(np.float32)
    got = np.asarray(preprocess.resize_bilinear(jnp.asarray(src), (20, 28)))
    want = np.stack([
        np.asarray(Image.fromarray(src[..., c]).resize((28, 20), Image.BILINEAR))
        for c in range(3)], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_preprocess_depth_preserves_range():
    depth = np.full((2, 30, 40), 17.0, np.float32)
    out = preprocess.preprocess_depth(jnp.asarray(depth), (15, 20))
    assert out.shape == (2, 15, 20)
    np.testing.assert_allclose(np.asarray(out), 17.0, rtol=1e-5)


def test_preprocess_batch_deterministic_in_key():
    key = jax.random.key(3)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.integers(0, 256, (4, 16, 20, 3)), jnp.uint8)
    depth = jnp.asarray(rng.uniform(1, 50, (4, 16, 20)), jnp.float32)
    a1 = preprocess.preprocess_batch(img, depth, (8, 10), (4, 5), key=key)
    a2 = preprocess.preprocess_batch(img, depth, (8, 10), (4, 5), key=key)
    for x, y in zip(a1, a2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_s2d_emitting_preprocess_matches_oracle_plus_s2d():
    """oracle_preprocess_s2d == space_to_depth(oracle_preprocess) exactly
    (same math, relayout fused into the resize einsums)."""
    from ann3depth_tpu.models.encdec import space_to_depth
    from ann3depth_tpu.ops import pallas_preprocess as pp

    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.integers(0, 256, (3, 56, 72, 3)), jnp.uint8)
    params = pp.augment_params(jax.random.key(1), 3, (56, 72), (24, 32))
    hi = jax.lax.Precision.HIGHEST
    want = space_to_depth(
        pp.oracle_preprocess(img, params, out_hw=(24, 32),
                             precision=hi).astype(jnp.bfloat16), 4)
    got = pp.oracle_preprocess_s2d(img, params, out_hw=(24, 32), factor=4,
                                   precision=hi)
    assert got.shape == want.shape == (3, 6, 8, 48)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_preprocess_batch_emit_s2d_path():
    key = jax.random.key(7)
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.integers(0, 256, (2, 32, 40, 3)), jnp.uint8)
    depth = jnp.asarray(rng.uniform(1, 50, (2, 16, 20)), jnp.float32)
    im, dep = preprocess.preprocess_batch(img, depth, (16, 20), (8, 10),
                                          key=key, emit_s2d=4)
    assert im.shape == (2, 4, 5, 48) and im.dtype == jnp.bfloat16
    assert dep.shape == (2, 8, 10)
    # depth path identical to the rgb-emitting call (shares the same draw)
    _, dep_ref = preprocess.preprocess_batch(img, depth, (16, 20), (8, 10),
                                             key=key)
    np.testing.assert_array_equal(np.asarray(dep), np.asarray(dep_ref))


@pytest.mark.parametrize("factor", [2, 4])
def test_upsample_matmul_matches_jax_resize(factor):
    from ann3depth_tpu.ops.resize import upsample_matmul

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 1, (2, 7, 9, 5)), jnp.float32)
    got = upsample_matmul(x, factor)
    want = jax.image.resize(x, (2, 7 * factor, 9 * factor, 5),
                            method="bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_preprocess_batch_jits():
    key = jax.random.key(0)
    img = jnp.zeros((2, 16, 20, 3), jnp.uint8)
    depth = jnp.ones((2, 16, 20))
    fn = jax.jit(preprocess.preprocess_batch, static_argnums=(2, 3))
    out = fn(img, depth, (8, 10), (4, 5), key=key)
    assert out[0].shape == (2, 8, 10, 3) and out[1].shape == (2, 4, 5)
