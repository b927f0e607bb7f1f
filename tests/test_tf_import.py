"""TF checkpoint import round-trip (SURVEY §4.5 — the parity harness is
testable without the reference by writing our own TF checkpoints)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from ann3depth_tpu.compat import tf_ckpt_import as tfi  # noqa: E402
from ann3depth_tpu.config import ModelConfig  # noqa: E402
from ann3depth_tpu.models import registry  # noqa: E402
from ann3depth_tpu.train import step as steplib  # noqa: E402


@pytest.fixture(scope="module")
def small_model():
    model = registry.build(ModelConfig(name="small", compute_dtype="float32"))
    params = steplib.init_params(model, (48, 64), seed=3)
    return model, params


def _write_tf_ckpt(path, flat: dict):
    """Write {name: array} as a TF1-style checkpoint with verbatim variable
    names (what the reference's Saver produced). Needs graph mode."""
    with tf.Graph().as_default():
        variables = {
            n: tf.compat.v1.get_variable(n, initializer=np.asarray(v))
            for n, v in flat.items()}
        saver = tf.compat.v1.train.Saver(var_list=variables)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            return saver.save(sess, path)


@pytest.mark.slow
def test_roundtrip_identity_map(small_model, tmp_path):
    model, params = small_model
    flat = tfi._flatten_with_paths(params)
    perturbed = {p: np.asarray(v) + 0.25 for p, v in flat.items()}

    tf.compat.v1.reset_default_graph()
    ckpt = _write_tf_ckpt(str(tmp_path / "ref.ckpt"), perturbed)

    names = tfi.list_variables(ckpt)
    assert set(names) >= set(perturbed)

    imported = tfi.import_checkpoint(ckpt, params)
    got = tfi._flatten_with_paths(imported)
    for p in flat:
        np.testing.assert_allclose(got[p], perturbed[p], rtol=1e-6)


@pytest.mark.slow
def test_shape_mismatch_is_loud(small_model, tmp_path):
    model, params = small_model
    flat = tfi._flatten_with_paths(params)
    bad = {p: np.zeros((2, 2), np.float32) for p in flat}
    tf.compat.v1.reset_default_graph()
    ckpt = _write_tf_ckpt(str(tmp_path / "bad.ckpt"), bad)
    with pytest.raises(ValueError, match="shape mismatch"):
        tfi.import_checkpoint(ckpt, params)


@pytest.mark.slow
def test_missing_variable_is_loud(small_model, tmp_path):
    model, params = small_model
    flat = tfi._flatten_with_paths(params)
    partial = dict(list(flat.items())[:1])
    tf.compat.v1.reset_default_graph()
    ckpt = _write_tf_ckpt(str(tmp_path / "partial.ckpt"),
                          {p: np.asarray(v) for p, v in partial.items()})
    with pytest.raises(KeyError, match="lacks variables"):
        tfi.import_checkpoint(ckpt, params)


def test_verify_outputs_gate(small_model):
    model, params = small_model
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 48, 64, 3)),
                    jnp.float32)
    y = np.asarray(model.apply({"params": params}, x))
    report = tfi.verify_outputs(model.apply, params, x, y)
    assert report["within_tolerance"]
    with pytest.raises(AssertionError, match="parity failure"):
        tfi.verify_outputs(model.apply, params, x, y + 1.0)


def test_tf1_scoped_name_map_schema(small_model):
    """The hypothesized TF1 schema (r5, VERDICT r4 Missing #5): sequential
    creation-order conv names, style-dependent leaf names."""
    _, params = small_model
    m = tfi.tf1_scoped_name_map(params)
    assert m["conv1/kernel"] == "conv2d/kernel"
    assert m["conv1/bias"] == "conv2d/bias"
    assert m["conv2/kernel"] == "conv2d_1/kernel"
    assert m["conv3/bias"] == "conv2d_2/bias"
    s = tfi.tf1_scoped_name_map(params, scope="model", style="slim")
    assert s["conv1/kernel"] == "model/Conv/weights"
    assert s["conv3/bias"] == "model/Conv_2/biases"
    with pytest.raises(ValueError, match="misses modules"):
        tfi.tf1_scoped_name_map(params, layer_order=["conv1"])


def test_tf1_scoped_name_map_norm_layers():
    """encdec's GroupNorm modules map to gamma/beta with their own
    sequential counter, convs to theirs."""
    model = registry.build(ModelConfig(name="encdec",
                                       compute_dtype="float32"))
    params = steplib.init_params(model, (48, 64), seed=0)
    m = tfi.tf1_scoped_name_map(params)
    assert m["enc0/GroupNorm_0/scale"] == "group_norm/gamma"
    assert m["enc0/GroupNorm_0/bias"] == "group_norm/beta"
    assert m["enc1/GroupNorm_0/scale"] == "group_norm_1/gamma"
    # conv counter independent of the norm counter, creation order =
    # alphabetical module order (dec0/conv_up is the first conv module)
    assert m["dec0/conv_up/kernel"] == "conv2d/kernel"
    assert m["head/kernel"].startswith("conv2d_")
    # the map is a bijection (no two flax paths share a TF name)
    assert len(set(m.values())) == len(m)


@pytest.mark.slow
def test_roundtrip_tf1_scoped_names(small_model, tmp_path):
    """Full non-identity round trip: write a TF checkpoint IN the
    hypothesized reference schema, import through the map, and assert
    the forward outputs equal the source params' (the parity-day
    mechanics, proven before the reference exists)."""
    model, params = small_model
    flat = tfi._flatten_with_paths(params)
    rng = np.random.default_rng(4)
    perturbed = {p: np.asarray(v) + rng.normal(0, 0.05, v.shape).astype(
        np.float32) for p, v in flat.items()}
    name_map = tfi.tf1_scoped_name_map(params)

    tf.compat.v1.reset_default_graph()
    ckpt = _write_tf_ckpt(str(tmp_path / "scoped.ckpt"),
                          {name_map[p]: v for p, v in perturbed.items()})
    assert set(tfi.list_variables(ckpt)) >= set(name_map.values())
    # identity map against this checkpoint must fail loudly (the schemas
    # genuinely differ — this is what makes the test non-trivial)
    with pytest.raises(KeyError, match="lacks variables"):
        tfi.import_checkpoint(ckpt, params)

    imported = tfi.import_checkpoint(ckpt, params, name_map=name_map)
    got = tfi._flatten_with_paths(imported)
    for p in flat:
        np.testing.assert_allclose(got[p], perturbed[p], rtol=1e-6)
    x = np.asarray(np.random.default_rng(0).normal(0, 1, (1, 48, 64, 3)),
                   np.float32)
    y_src = np.asarray(model.apply({"params": imported}, x))
    tfi.verify_outputs(model.apply, imported, x, y_src)


@pytest.mark.slow
def test_roundtrip_layout_transform(small_model, tmp_path):
    """A checkpoint stored in a FOREIGN kernel layout (OIHW, the
    torch/NCHW-era convention) imports through the `transform` hook;
    shape checking stays loud without it."""
    model, params = small_model
    flat = tfi._flatten_with_paths(params)
    name_map = tfi.tf1_scoped_name_map(params)
    foreign = {}
    for p, v in flat.items():
        a = np.asarray(v)
        if a.ndim == 4:  # HWIO -> OIHW
            a = a.transpose(3, 2, 0, 1)
        foreign[name_map[p]] = a
    tf.compat.v1.reset_default_graph()
    ckpt = _write_tf_ckpt(str(tmp_path / "oihw.ckpt"), foreign)

    with pytest.raises(ValueError, match="shape mismatch"):
        tfi.import_checkpoint(ckpt, params, name_map=name_map)

    def back(path, arr):
        return arr.transpose(2, 3, 1, 0) if arr.ndim == 4 else arr

    imported = tfi.import_checkpoint(ckpt, params, name_map=name_map,
                                     transform=back)
    got = tfi._flatten_with_paths(imported)
    for p in flat:
        np.testing.assert_allclose(got[p], np.asarray(flat[p]), rtol=1e-6)
