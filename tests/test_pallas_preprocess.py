"""Fused Pallas preprocess parity tests (SURVEY §4.2): kernel (interpret
mode on CPU) vs the XLA oracle, and the oracle vs jax.image.resize to anchor
resize semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu.compat import reference_spec as ref
from ann3depth_tpu.ops import pallas_preprocess as pp
from ann3depth_tpu.ops import resize as rz
from ann3depth_tpu.pipeline import preprocess

RNG = np.random.default_rng(0)


def _frames(b=2, h=40, w=56, c=3):
    return RNG.integers(0, 256, (b, h, w, c), dtype=np.uint8)


def test_oracle_resize_matches_jax_image_downsample():
    """Identity geometry == jax.image.resize (antialiased) on downsample."""
    x = _frames(1, 48, 64)
    params = pp.identity_params(1, (48, 64), (24, 32))
    got = pp.oracle_preprocess(jnp.asarray(x), params, out_hw=(24, 32),
                               norm=False) * 255.0
    want = jax.image.resize(x.astype(np.float32), (1, 24, 32, 3), "bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-2)


def test_oracle_resize_matches_jax_image_upsample():
    x = _frames(1, 24, 32)
    params = pp.identity_params(1, (24, 32), (48, 64))
    got = pp.oracle_preprocess(jnp.asarray(x), params, out_hw=(48, 64),
                               norm=False) * 255.0
    want = jax.image.resize(x.astype(np.float32), (1, 48, 64, 3), "bilinear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-2)


def test_flip_params_reverse_columns():
    x = _frames(1, 16, 16)
    start, scale = rz.window_params(16, 16, crop_start=jnp.zeros(()),
                                    crop_frac=1.0,
                                    flip=jnp.ones((), bool))
    params = pp.identity_params(1, (16, 16), (16, 16))
    params = params.at[0, 2].set(start).at[0, 3].set(scale)
    got = pp.oracle_preprocess(jnp.asarray(x), params, out_hw=(16, 16),
                               norm=False)
    plain = pp.oracle_preprocess(
        jnp.asarray(x), pp.identity_params(1, (16, 16), (16, 16)),
        out_hw=(16, 16), norm=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(plain)[:, :, ::-1],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("augmented", [False, True])
def test_fused_kernel_matches_oracle(augmented):
    """The flagship parity test: Pallas kernel (interpret) == XLA oracle."""
    b, h, w = 2, 40, 56
    x = jnp.asarray(_frames(b, h, w))
    out_hw = (24, 32)
    if augmented:
        params = pp.augment_params(jax.random.key(1), b, (h, w), out_hw)
    else:
        params = pp.identity_params(b, (h, w), out_hw)
    got = pp.fused_preprocess(x, params, out_hw=out_hw, interpret=True)
    want = pp.oracle_preprocess(x, params, out_hw=out_hw)
    # bf16 column matmul in the kernel: ~0.4% relative; normalized pixel
    # units span ~[-2.2, 2.6], so atol 0.03 is ~0.7% of range.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.02, atol=0.03)


@pytest.mark.parametrize("augmented", [False, True])
def test_fused_kernel_v2_matches_oracle(augmented):
    """v2 (XLA-precomputed weight matrices as operands) == XLA oracle."""
    b, h, w = 2, 40, 56
    x = jnp.asarray(_frames(b, h, w))
    out_hw = (24, 32)
    if augmented:
        params = pp.augment_params(jax.random.key(1), b, (h, w), out_hw)
    else:
        params = pp.identity_params(b, (h, w), out_hw)
    got = pp.fused_preprocess_v2(x, params, out_hw=out_hw, interpret=True)
    want = pp.oracle_preprocess(x, params, out_hw=out_hw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.02, atol=0.03)


def test_fused_kernel_v2_depth_mode():
    b, dh, dw = 2, 30, 22
    depth = jnp.asarray(RNG.uniform(1, 60, (b, dh, dw, 1)), jnp.float32)
    params = pp.identity_params(b, (dh, dw), (15, 11))
    got = pp.fused_preprocess_v2(depth, params, out_hw=(15, 11),
                                 depth_mode=True, interpret=True)
    want = pp.oracle_preprocess(depth, params, out_hw=(15, 11),
                                depth_mode=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.02, atol=0.05)


def test_fused_kernel_depth_mode():
    b, dh, dw = 2, 30, 22
    depth = jnp.asarray(RNG.uniform(1, 60, (b, dh, dw, 1)), jnp.float32)
    params = pp.identity_params(b, (dh, dw), (15, 11))
    got = pp.fused_preprocess(depth, params, out_hw=(15, 11),
                              depth_mode=True, interpret=True)
    want = pp.oracle_preprocess(depth, params, out_hw=(15, 11),
                                depth_mode=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.01, atol=0.05)


def test_depth_constant_preserved():
    depth = jnp.full((1, 20, 24, 1), 13.0)
    params = pp.identity_params(1, (20, 24), (10, 12))
    out = pp.oracle_preprocess(depth, params, out_hw=(10, 12), depth_mode=True)
    np.testing.assert_allclose(np.asarray(out), 13.0, rtol=1e-5)


def test_preprocess_batch_flip_consistency():
    """Same key => image and depth flip/crop together (shared-draw design)."""
    b, h, w = 8, 32, 40
    # column-index ramp images and depths
    img = np.tile(np.linspace(0, 255, w, dtype=np.uint8)[None, None, :, None],
                  (b, h, 1, 3))
    dep = np.tile(np.linspace(1, 50, 20, dtype=np.float32)[None, None, :],
                  (b, 10, 1))
    key = jax.random.key(4)
    im_out, dep_out = preprocess.preprocess_batch(
        jnp.asarray(img), jnp.asarray(dep), (16, 20), (8, 10), key=key)
    for i in range(b):
        im_flipped = bool(im_out[i, 0, 0, 0] > im_out[i, 0, -1, 0])
        dep_flipped = bool(dep_out[i, 0, 0] > dep_out[i, 0, -1])
        assert im_flipped == dep_flipped


def test_preprocess_batch_eval_path_values():
    """Eval path: constant white frame -> exact normalization constants."""
    img = np.full((1, 32, 40, 3), 255, np.uint8)
    dep = np.full((1, 16, 20), 7.0, np.float32)
    im, dp = preprocess.preprocess_batch(
        jnp.asarray(img), jnp.asarray(dep), (16, 20), (8, 10), key=None)
    want = (1.0 - np.asarray(ref.RGB_MEAN)) / np.asarray(ref.RGB_STD)
    np.testing.assert_allclose(np.asarray(im)[0, 3, 4], want, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dp), 7.0, rtol=1e-4)


def test_flip_of_crop_equals_reversed_crop():
    """Flip composed with crop-zoom == column-reverse of the plain crop."""
    x = _frames(1, 24, 32)
    oy = jnp.full((), 0.3)
    base = pp.identity_params(1, (24, 32), (12, 16))

    sx, scx = rz.window_params(32, 16, crop_start=oy, crop_frac=0.875)
    p_crop = base.at[0, 2].set(sx).at[0, 3].set(scx)
    fx, fcx = rz.window_params(32, 16, crop_start=oy, crop_frac=0.875,
                               flip=jnp.ones((), bool))
    p_flip = base.at[0, 2].set(fx).at[0, 3].set(fcx)

    crop = pp.oracle_preprocess(jnp.asarray(x), p_crop, out_hw=(12, 16),
                                norm=False)
    flip = pp.oracle_preprocess(jnp.asarray(x), p_flip, out_hw=(12, 16),
                                norm=False)
    np.testing.assert_allclose(np.asarray(flip),
                               np.asarray(crop)[:, :, ::-1], rtol=1e-4,
                               atol=1e-4)


def test_augment_params_deterministic():
    p1 = pp.augment_params(jax.random.key(9), 4, (32, 40), (16, 20))
    p2 = pp.augment_params(jax.random.key(9), 4, (32, 40), (16, 20))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_depth_resample_masks_saturated_pixels():
    """Saturated laser pixels (> MAKE3D_DEPTH_CAP) must not bleed into valid
    neighbors through the resize weights (ADVICE r1): outputs are either a
    pure weighted average of valid source pixels or 0 (invalid)."""
    dh, dw = 20, 24
    depth = np.full((1, dh, dw, 1), 50.0, np.float32)
    depth[0, :, dw // 2:, 0] = 81.0  # saturated right half
    params = pp.identity_params(1, (dh, dw), (10, 12))
    out = np.asarray(pp.oracle_preprocess(
        jnp.asarray(depth), params, out_hw=(10, 12),
        depth_mode=True))[0, ..., 0]
    # 50 is the only valid source value -> any valid output is exactly 50;
    # a 50/81 blend anywhere is the regression this guards against.
    assert np.all((np.abs(out - 50.0) < 1e-3) | (out == 0.0)), out
    assert (out == 0.0).any() and (np.abs(out - 50.0) < 1e-3).any()
    # Kernel obeys the same invariant (bf16 renorm -> looser value tol; the
    # at-threshold footprint decision may legitimately differ from f32).
    got = np.asarray(pp.fused_preprocess(
        jnp.asarray(depth), params, out_hw=(10, 12), depth_mode=True,
        interpret=True))[0, ..., 0]
    assert np.all((np.abs(got - 50.0) < 0.5) | (got == 0.0)), got


def test_depth_resample_renormalizes_missing_pixels():
    """NYU-style missing depth (0) is excluded and the remaining weights
    renormalized: a constant-4 frame with scattered holes resamples to
    exactly 4 wherever the footprint stays majority-valid."""
    depth = np.full((1, 16, 16, 1), 4.0, np.float32)
    depth[0, ::2, ::2, 0] = 0.0
    params = pp.identity_params(1, (16, 16), (8, 8))
    out = np.asarray(pp.oracle_preprocess(
        jnp.asarray(depth), params, out_hw=(8, 8), depth_mode=True))
    assert (out > 0).any()
    np.testing.assert_allclose(out[out > 0], 4.0, rtol=1e-4)


def test_crop_zoom_scales_depth():
    """Forced crop: depth values get multiplied by the window fraction."""
    b, dh, dw = 1, 24, 24
    depth = jnp.full((b, dh, dw, 1), 10.0)
    start, scale = rz.window_params(dh, 12, crop_start=jnp.full((), 0.5),
                                    crop_frac=pp.CROP_FRAC)
    params = (pp.identity_params(b, (dh, dw), (12, 12))
              .at[0, 0].set(start).at[0, 1].set(scale)
              .at[0, 4].set(pp.CROP_FRAC))
    out = pp.oracle_preprocess(depth, params, out_hw=(12, 12), depth_mode=True)
    np.testing.assert_allclose(np.asarray(out), 10.0 * pp.CROP_FRAC, rtol=1e-5)
