"""TF-checkpoint -> JAX pytree import harness (SURVEY §7.2 M7, [B:5]).

Purpose: numerical-parity validation against the reference's trained
models — load a TensorFlow checkpoint (TF1 Saver family or TF2, both
readable via tf.train.load_checkpoint from the installed TF 2.21), map its
variables onto a Flax params template, and compare depth-map outputs within
float tolerance.

Status: the reference repo and its checkpoints were unavailable this
session (SURVEY §0), so the *exact* variable-name schema is expressed as a
pluggable `name_map`; `default_name_map` documents the expected convention
(flax path "<module>/kernel" <-> TF "<scope>/weights"-style names can be
overridden per checkpoint). The harness itself is fully functional and
round-trip tested against checkpoints we write ourselves
(tests/test_tf_import.py).

Layout conventions handled:
- conv kernels: TF stores HWIO — identical to Flax; imported as-is.
- dense kernels: TF stores (in, out) — identical to Flax.
- biases: 1-D, shared convention.
No transposes are silently applied; any shape mismatch is a hard error
listing both shapes (the classic silent-corruption trap).
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Optional

import jax
import numpy as np

log = logging.getLogger(__name__)


def _flatten_with_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        keys = [getattr(k, "key", getattr(k, "idx", str(k))) for k in path]
        out["/".join(str(k) for k in keys)] = leaf
    return out


def list_variables(ckpt_path: str) -> Dict[str, tuple]:
    """{tf_variable_name: shape} for any TF checkpoint."""
    import tensorflow as tf  # local: TF import is heavy

    reader = tf.train.load_checkpoint(ckpt_path)
    return {name: tuple(shape) for name, shape in
            reader.get_variable_to_shape_map().items()}


def default_name_map(params) -> Dict[str, str]:
    """Identity mapping: flax path -> same string as TF variable name.

    The round-trip tests use this; importing a real reference checkpoint
    supplies a custom map once the reference's actual scopes are readable
    (SURVEY §0 protocol step 1). `tf1_scoped_name_map` below encodes the
    expected real-world schema.
    """
    return {p: p for p in _flatten_with_paths(params)}


def tf1_scoped_name_map(params, *, scope: str = "", style: str = "layers",
                        layer_order=None) -> Dict[str, str]:
    """Hypothesized reference variable schema -> {flax_path: tf_name}.

    The reference's exact Saver names are unknowable until its tree is
    readable (SURVEY §0); this builder encodes the overwhelmingly likely
    TF1 convention so parity day starts from proven machinery instead of
    an untested identity map (VERDICT r4 Missing #5). TF1-era graphs
    name variables by CREATION ORDER under auto-uniquified scopes:

      style="layers"  tf.layers.conv2d:   conv2d/kernel, conv2d_1/kernel,
                      ... with conv2d_N/bias; norm layers as
                      group_norm[_N]/gamma|beta.
      style="slim"    tf.contrib.slim:    Conv/weights, Conv_1/weights,
                      ... with Conv_N/biases; norm as GroupNorm[_N]/
                      gamma|beta.

    An optional outer variable scope ("<scope>/...") prefixes every name.

    Flax modules map to sequential TF layers: each distinct path prefix
    is one layer; a module holding {kernel[, bias]} is a conv layer, one
    holding {scale, bias} is a norm layer (scale->gamma, bias->beta).
    `layer_order` lists flax module prefixes in TF creation order; it
    defaults to alphabetical flatten order, which matches this repo's
    models (conv1 < conv2 < ..., enc0 < enc1 < ... — sequential by
    construction). Pass it explicitly if the reference's graph builds
    layers in a different order.

    Layouts (module docstring): conv kernels are HWIO in both worlds and
    dense kernels (in, out) in both — no transpose belongs in the MAP;
    a checkpoint from a different layout convention supplies
    import_checkpoint's `transform` hook instead.
    """
    if style == "layers":
        conv_base, kernel, bias, norm_base = "conv2d", "kernel", "bias", \
            "group_norm"
    elif style == "slim":
        conv_base, kernel, bias, norm_base = "Conv", "weights", "biases", \
            "GroupNorm"
    else:
        raise ValueError(f"unknown style {style!r}; have layers | slim")

    flat = _flatten_with_paths(params)
    modules: Dict[str, Dict[str, str]] = {}
    for path in flat:
        prefix, _, leaf = path.rpartition("/")
        modules.setdefault(prefix, {})[leaf] = path
    order = list(layer_order) if layer_order is not None else sorted(modules)
    unknown = set(modules) - set(order)
    if layer_order is not None and unknown:
        raise ValueError(f"layer_order misses modules {sorted(unknown)}")

    def _uniq(base: str, i: int) -> str:
        return base if i == 0 else f"{base}_{i}"

    out: Dict[str, str] = {}
    n_conv = n_norm = 0
    for prefix in order:
        leaves = modules[prefix]
        pre = f"{scope}/" if scope else ""
        if "scale" in leaves:  # norm layer: scale/bias -> gamma/beta
            tf_mod = _uniq(norm_base, n_norm)
            n_norm += 1
            out[leaves["scale"]] = f"{pre}{tf_mod}/gamma"
            if "bias" in leaves:
                out[leaves["bias"]] = f"{pre}{tf_mod}/beta"
        else:  # conv/dense layer
            tf_mod = _uniq(conv_base, n_conv)
            n_conv += 1
            if "kernel" in leaves:
                out[leaves["kernel"]] = f"{pre}{tf_mod}/{kernel}"
            if "bias" in leaves:
                out[leaves["bias"]] = f"{pre}{tf_mod}/{bias}"
        handled = {"scale", "kernel", "bias"}
        for leaf, path in leaves.items():
            if leaf not in handled:
                out[path] = f"{pre}{tf_mod}/{leaf}"
    return out


def import_checkpoint(ckpt_path: str, params_template,
                      name_map: Optional[Dict[str, str]] = None,
                      transform: Optional[Callable[[str, np.ndarray],
                                                   np.ndarray]] = None):
    """Load TF checkpoint values into a copy of `params_template`.

    name_map: flax_path -> tf_variable_name (default: identity).
    transform: optional (path, array) -> array hook (e.g. transposes for a
      checkpoint that used a different conv layout).

    Raises KeyError on missing variables and ValueError on shape mismatch —
    never silently skips.
    """
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    available = set(reader.get_variable_to_shape_map())
    flat = _flatten_with_paths(params_template)
    name_map = name_map or default_name_map(params_template)

    missing = [p for p in flat if name_map.get(p) not in available]
    if missing:
        raise KeyError(
            f"checkpoint {ckpt_path} lacks variables for paths {missing[:5]}"
            f"{'...' if len(missing) > 5 else ''}; available: "
            f"{sorted(available)[:5]}...")

    new_flat = {}
    for path, leaf in flat.items():
        arr = np.asarray(reader.get_tensor(name_map[path]))
        if transform is not None:
            arr = transform(path, arr)
        if arr.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch at {path}: checkpoint {arr.shape} vs "
                f"model {leaf.shape}")
        new_flat[path] = arr.astype(np.asarray(leaf).dtype)

    # rebuild the tree in template order
    leaves_paths = jax.tree_util.tree_flatten_with_path(params_template)
    treedef = leaves_paths[1]
    ordered = []
    for path, _ in leaves_paths[0]:
        keys = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)
        ordered.append(new_flat[keys])
    return jax.tree_util.tree_unflatten(treedef, ordered)


def verify_outputs(apply_fn, params, inputs: np.ndarray,
                   expected: np.ndarray, rtol: float = 1e-4,
                   atol: float = 1e-4) -> dict:
    """Forward `inputs` and compare to reference `expected` depth maps.

    Returns a report dict; raises AssertionError on mismatch beyond
    tolerance — the [B:5] pixel-parity gate.
    """
    got = np.asarray(apply_fn({"params": params}, inputs))
    expected = np.asarray(expected).reshape(got.shape)
    abs_err = np.abs(got - expected)
    rel_err = abs_err / np.maximum(np.abs(expected), 1e-8)
    report = {
        "max_abs_err": float(abs_err.max()),
        "max_rel_err": float(rel_err.max()),
        "mean_abs_err": float(abs_err.mean()),
        "within_tolerance": bool(
            np.allclose(got, expected, rtol=rtol, atol=atol)),
    }
    if not report["within_tolerance"]:
        raise AssertionError(f"parity failure: {report}")
    return report
