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
    (SURVEY §0 protocol step 1).
    """
    return {p: p for p in _flatten_with_paths(params)}


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
