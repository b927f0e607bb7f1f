"""jax.export serving artifacts (ann3depth_tpu/serving.py).

The exported program must be the serving program: raw uint8 frames ->
on-device preprocess -> forward -> linear depth, loadable WITHOUT model
code and numerically equal to calling the serving fn directly.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ann3depth_tpu import serving
from ann3depth_tpu.config import get_config
from ann3depth_tpu.models import registry
from ann3depth_tpu.train import step as steplib

RAW_HW = (56, 72)


def _tiny_cfg(model=None):
    cfg = get_config("smoke")  # small net, f32, synthetic
    data = dataclasses.replace(cfg.data, input_hw=(48, 64))
    out = dataclasses.replace(cfg, data=data)
    if model is not None:
        out = dataclasses.replace(
            out, model=dataclasses.replace(cfg.model, name=model))
    return out


def _params(cfg):
    model = registry.build(cfg.model)
    return model, steplib.init_params(model, cfg.data.input_hw, seed=0)


def _frames(batch, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (batch, *RAW_HW, 3), dtype=np.uint8)


def test_export_roundtrip_fixed_batch(tmp_path):
    cfg = _tiny_cfg()
    model, params = _params(cfg)
    meta = serving.export_serving(cfg, params, tmp_path, batch=2,
                                  raw_hw=RAW_HW)
    assert meta["model"] == "small" and meta["batch"] == 2
    assert meta["param_count"] == sum(
        int(np.asarray(l).size) for l in jax.tree.leaves(params))

    loaded = serving.load_serving(tmp_path)
    img = _frames(2)
    got = loaded.predict(img)

    fn = serving.make_serving_fn(model, cfg.model.name, cfg.data.input_hw)
    want = np.asarray(jax.jit(fn)(params, jnp.asarray(img)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # depth is linear meters: strictly positive
    assert (got > 0).all()


def test_export_polymorphic_batch(tmp_path):
    cfg = _tiny_cfg()
    model, params = _params(cfg)
    meta = serving.export_serving(cfg, params, tmp_path, batch=None,
                                  raw_hw=RAW_HW)
    assert meta["batch"] is None
    assert meta["out_shape"][0] == "batch"  # symbolic leading dim

    loaded = serving.load_serving(tmp_path)
    fn = serving.make_serving_fn(model, cfg.model.name, cfg.data.input_hw)
    for b in (1, 3):
        img = _frames(b, seed=b)
        got = loaded.predict(img)
        want = np.asarray(jax.jit(fn)(params, jnp.asarray(img)))
        assert got.shape[0] == b
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_encdec_s2d_path_exports(tmp_path):
    """encdec's s2d-emitting preprocess (batch-reshapes) must export too."""
    cfg = _tiny_cfg(model="encdec")
    model, params = _params(cfg)
    serving.export_serving(cfg, params, tmp_path, batch=None, raw_hw=RAW_HW)
    loaded = serving.load_serving(tmp_path)
    img = _frames(2)
    got = loaded.predict(img)
    fn = serving.make_serving_fn(model, cfg.model.name, cfg.data.input_hw)
    want = np.asarray(jax.jit(fn)(params, jnp.asarray(img)))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)  # bf16 model
    assert np.isfinite(got).all()


def test_encdec_int8_quant_exports(tmp_path):
    """The int8 serving twin (dynamic activation scales + round(), same
    param tree as bf16 training) must serialize via jax.export too — the
    deployment recipe is train bf16/QAT, export --quant int8."""
    cfg = _tiny_cfg(model="encdec")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, quant="int8"))
    model, params = _params(cfg)
    meta = serving.export_serving(cfg, params, tmp_path, batch=None,
                                  raw_hw=RAW_HW)
    assert meta["quant"] == "int8"
    loaded = serving.load_serving(tmp_path)
    img = _frames(2)
    got = loaded.predict(img)
    fn = serving.make_serving_fn(model, cfg.model.name, cfg.data.input_hw)
    want = np.asarray(jax.jit(fn)(params, jnp.asarray(img)))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    assert np.isfinite(got).all() and (got > 0).all()


def test_dpt_export_polymorphic():
    """DPT (ViT attention + jax.image.resize head) serializes and round-
    trips batch-polymorphically too. export_serving builds the full-size
    DPT from the registry (too big for a unit test), so this drives the
    same jax.export machinery on a tiny instance via make_serving_fn."""
    from jax import export as jax_export

    from ann3depth_tpu.models.dpt import DPTDepthNet

    model = DPTDepthNet(dim=64, depth=4, heads=2, fusion_features=32,
                        tap_layers=(0, 1, 2, 3), remat=False,
                        compute_dtype=jnp.float32)
    params = steplib.init_params(model, (32, 32), seed=0)

    fn = serving.make_serving_fn(model, "dpt", (32, 32))
    (bdim,) = jax_export.symbolic_shape("batch")
    img_sds = jax.ShapeDtypeStruct((bdim, *RAW_HW, 3), jnp.uint8)
    p_sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), params)
    exported = jax_export.export(jax.jit(fn), platforms=["cpu", "tpu"])(
        p_sds, img_sds)
    reloaded = jax_export.deserialize(bytearray(exported.serialize()))
    for b in (1, 2):
        img = _frames(b, seed=b)
        got = np.asarray(reloaded.call(params, jnp.asarray(img)))
        want = np.asarray(jax.jit(fn)(params, jnp.asarray(img)))
        assert got.shape == (b, 32, 32)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bf16_params_survive_npz_roundtrip(tmp_path):
    """Non-numpy-native param dtypes are stored as f32 + cast back exactly."""
    cfg = _tiny_cfg()
    model, params = _params(cfg)
    params16 = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    serving.export_serving(cfg, params16, tmp_path, batch=2, raw_hw=RAW_HW)
    loaded = serving.load_serving(tmp_path)
    leaves = jax.tree.leaves(loaded._params)
    assert all(l.dtype == jnp.bfloat16 for l in leaves)
    # bitwise: bf16 -> f32 -> bf16 is lossless
    for a, b in zip(jax.tree.leaves(params16), leaves):
        np.testing.assert_array_equal(
            np.asarray(a).view(np.uint16), np.asarray(b).view(np.uint16))
    got = loaded.predict(_frames(2))
    assert np.isfinite(got).all()


def test_cli_export_after_train(tmp_path, capsys):
    """End to end: train a few steps, export from the checkpoint, serve."""
    from ann3depth_tpu.cli import main

    ckpt = tmp_path / "ckpt"
    rc = main(["train", "--config", "smoke", "--steps", "3",
               "--batch-size", "2", "--ckpt-dir", str(ckpt),
               "--workdir", str(tmp_path)])
    assert rc == 0
    out_dir = tmp_path / "artifact"
    rc = main(["export", "--config", "smoke", "--ckpt-dir", str(ckpt),
               "--out-dir", str(out_dir), "--serving-batch", "2",
               "--raw-hw", "56", "72"])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["batch"] == 2 and meta["raw_hw"] == [56, 72]

    loaded = serving.load_serving(out_dir)
    got = loaded.predict(_frames(2))
    assert got.shape[0] == 2 and np.isfinite(got).all()


def test_cli_export_ema_bakes_averaged_weights(tmp_path, capsys):
    """export --ema: the artifact carries the Polyak-averaged weights
    (distinct from the raw ones after a few steps at decay 0.5)."""
    from ann3depth_tpu.cli import main

    ckpt = tmp_path / "ckpt"
    rc = main(["train", "--config", "smoke", "--steps", "3",
               "--batch-size", "2", "--ema-decay", "0.5",
               "--ckpt-dir", str(ckpt), "--workdir", str(tmp_path)])
    assert rc == 0
    for tag, flags in (("raw", []), ("ema", ["--ema"])):
        rc = main(["export", "--config", "smoke", "--ckpt-dir", str(ckpt),
                   "--out-dir", str(tmp_path / tag),
                   "--raw-hw", "56", "72", *flags])
        assert rc == 0
    capsys.readouterr()
    raw = np.load(tmp_path / "raw" / "params.npz")
    ema = np.load(tmp_path / "ema" / "params.npz")
    assert set(raw.files) == set(ema.files)
    assert any(not np.array_equal(raw[k], ema[k]) for k in raw.files)
    got = serving.load_serving(tmp_path / "ema").predict(_frames(2))
    assert np.isfinite(got).all()


def test_cli_export_requires_checkpoint(tmp_path):
    from ann3depth_tpu.cli import main

    with pytest.raises(RuntimeError, match="no checkpoint"):
        main(["export", "--config", "smoke",
              "--ckpt-dir", str(tmp_path / "none"),
              "--out-dir", str(tmp_path / "a")])
