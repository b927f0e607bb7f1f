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


def test_preprocess_batch_jits():
    key = jax.random.key(0)
    img = jnp.zeros((2, 16, 20, 3), jnp.uint8)
    depth = jnp.ones((2, 16, 20))
    fn = jax.jit(preprocess.preprocess_batch, static_argnums=(2, 3))
    out = fn(img, depth, (8, 10), (4, 5), key=key)
    assert out[0].shape == (2, 8, 10, 3) and out[1].shape == (2, 4, 5)
