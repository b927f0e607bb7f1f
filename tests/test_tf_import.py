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
