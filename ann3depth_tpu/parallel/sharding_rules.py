"""Parameter sharding rules: DP replication + tensor-parallel rules for the
DPT transformer (SURVEY §2.3 TP row — the mesh design reserves a "model"
axis so the ViT stretch config can shard attention heads / MLP hidden).

Approach: post-hoc path-pattern rules mapping each parameter to a
PartitionSpec over a ("data", "model") mesh. jit's sharding propagation
then partitions the matching activations and inserts the ICI collectives
(all-gather/reduce-scatter) — no model-code changes, no hand-written
collectives. The CNN models keep fully-replicated params (pure DP): at
320x240 CNN scale TP does not pay (documented SURVEY §2.3); rules exist so
the DPT path demonstrates and tests dp x tp composition.

Flax parameter shapes this maps (flax.linen defaults):
  MultiHeadDotProductAttention query/key/value kernel: (embed, heads, head_dim)
  MultiHeadDotProductAttention out kernel:             (heads, head_dim, embed)
  Dense kernel:                                        (in, out)
"""

from __future__ import annotations

import re
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"
DATA_AXIS = "data"

# (path-regex, spec-builder) — first match wins. Paths look like
# "block0/MultiHeadDotProductAttention_0/query/kernel".
_DPT_TP_RULES = [
    # attention projections: shard the heads axis
    (r".*/(query|key|value)/kernel$", lambda nd: P(None, MODEL_AXIS, None)),
    (r".*/(query|key|value)/bias$", lambda nd: P(MODEL_AXIS, None)),
    (r".*/out/kernel$", lambda nd: P(MODEL_AXIS, None, None)),
    (r".*/out/bias$", lambda nd: P()),
    # MLP: hidden dim sharded (Dense_0 expands, Dense_1 contracts)
    (r".*MLP_\d+/Dense_0/kernel$", lambda nd: P(None, MODEL_AXIS)),
    (r".*MLP_\d+/Dense_0/bias$", lambda nd: P(MODEL_AXIS)),
    (r".*MLP_\d+/Dense_1/kernel$", lambda nd: P(MODEL_AXIS, None)),
    (r".*MLP_\d+/Dense_1/bias$", lambda nd: P()),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def tp_spec_for(path: str, ndim: int) -> Optional[P]:
    for pattern, builder in _DPT_TP_RULES:
        if re.match(pattern, path):
            spec = builder(ndim)
            if len(spec) <= ndim:
                return spec
    return None


def shard_params(params, mesh: Mesh, tensor_parallel: bool = False):
    """Place params on the mesh: replicated, or TP-sharded where rules match.

    With tensor_parallel=False every param is replicated (pure DP). With
    True, transformer q/k/v/out and MLP kernels shard over the "model"
    axis; everything else replicates.

    Works on multi-process meshes too: device_put cannot address another
    process's shards, so placement goes through make_array_from_callback
    — every process holds the identical host leaf (seeded init / shared
    checkpoint restore) and materializes its own slices.
    """
    import numpy as np

    nproc = jax.process_count()

    def place(path, leaf):
        spec = P()
        if tensor_parallel and MODEL_AXIS in mesh.axis_names:
            s = tp_spec_for(_path_str(path), leaf.ndim)
            if s is not None:
                # only shard if the dimension divides the axis size
                axis = mesh.shape[MODEL_AXIS]
                ok = all(
                    dim is None or leaf.shape[i] % axis == 0
                    for i, dim in enumerate(s))
                if ok:
                    spec = s
        sharding = NamedSharding(mesh, spec)
        if nproc > 1:
            host = np.asarray(leaf)
            return jax.make_array_from_callback(
                host.shape, sharding, lambda idx, a=host: a[idx])
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map_with_path(place, params)


def describe_sharding(params) -> dict:
    """{path: PartitionSpec str} — for tests and debugging."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        sharding = getattr(leaf, "sharding", None)
        out[_path_str(path)] = str(getattr(sharding, "spec", sharding))
    return out
