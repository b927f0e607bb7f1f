"""AOT serving artifacts via jax.export (StableHLO).

Production-serving completeness for the rebuild (SURVEY.md §1 L5/L6: the
reference's deployment story was "ship the TF checkpoint + the Python
code"; the TPU-native equivalent is an ahead-of-time serialized program).
`export_serving` serializes the FULL serving pipeline — on-device
preprocess of raw uint8 frames (ops/resize.py triangle-matmul resample +
normalize, s2d-emitting for encdec) -> forward pass -> exp to linear
depth — as a portable StableHLO artifact plus a params archive. The
artifact is loadable and callable WITHOUT the model-definition code
(`jax.export.deserialize(...).call(params, frames)`), so a serving fleet
needs only jax + the artifact directory.

Batch handling: by default the export is batch-POLYMORPHIC
(`jax.export.symbolic_shape`) — one artifact serves any batch size, and
XLA specializes/compiles per concrete batch at the serving site (the
whole preprocess+model pipeline is batch-elementwise, so every op traces
under a symbolic leading dim). Pass a fixed `batch` to pin it instead.

Artifact directory layout:
    serving.jaxexport   serialized jax.export blob (StableHLO + calling conv)
    params.npz          flattened params ("/"-joined keys); non-numpy-native
                        dtypes (bf16) stored as f32 and cast back on load
                        (exact: bf16 -> f32 -> bf16 round-trips bitwise)
    meta.json           config/model names, shapes, dtypes, versions
"""

from __future__ import annotations

import json
import os

import numpy as np

ARTIFACT_FILE = "serving.jaxexport"
PARAMS_FILE = "params.npz"
META_FILE = "meta.json"

# dtypes np.savez stores natively; anything else (bf16, fp8) is cast to
# f32 for storage and cast back to the recorded dtype on load.
_NATIVE_KINDS = frozenset("fiub")


def make_serving_fn(model, model_name: str, input_hw, precision=None):
    """fn(params, img_u8[B,H,W,3]) -> linear depth [B,h,w] f32.

    The same program bench_infer measures: serving resize runs at DEFAULT
    matmul precision (the model computes in bf16 anyway; HIGHEST is the
    eval/live-parity choice of steplib.infer_step, not the serving one).
    """
    import jax
    import jax.numpy as jnp

    from ann3depth_tpu.models import registry
    from ann3depth_tpu.pipeline import preprocess

    emit = registry.s2d_input_factor(model_name)
    input_hw = tuple(input_hw)
    prec = jax.lax.Precision.DEFAULT if precision is None else precision

    def serve(params, img_u8):
        images = preprocess.preprocess_image(
            img_u8, input_hw, emit_s2d=emit, precision=prec)
        pred_log = model.apply({"params": params}, images)
        return jnp.exp(pred_log[..., 0])

    return serve


def export_serving(cfg, params, out_dir, *, batch=None, raw_hw=(480, 640),
                   platforms=("cpu", "tpu"), config_name=None):
    """Serialize the serving program + params into `out_dir`; returns meta.

    batch: None -> batch-polymorphic export (one artifact, any batch);
           int -> fixed batch.
    raw_hw: raw camera-frame shape the artifact accepts (resized on
            device by the exported preprocess).
    platforms: lowering targets baked into the artifact. Cross-platform
            lowering needs no device of that type at export time, so a
            CPU dev box can produce a TPU-servable artifact and vice
            versa.
    """
    import jax
    import jax.numpy as jnp
    from flax import traverse_util
    from jax import export as jax_export

    from ann3depth_tpu.models import registry

    model = registry.build(cfg.model)
    fn = make_serving_fn(model, cfg.model.name, cfg.data.input_hw)

    if batch is None:
        (bdim,) = jax_export.symbolic_shape("batch")
    else:
        bdim = int(batch)
    img_sds = jax.ShapeDtypeStruct((bdim, *raw_hw, 3), jnp.uint8)
    p_sds = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), params)
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(
        p_sds, img_sds)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT_FILE), "wb") as f:
        f.write(exported.serialize())

    flat = traverse_util.flatten_dict(params, sep="/")
    stored, dtypes = {}, {}
    for k, v in flat.items():
        a = np.asarray(v)
        dtypes[k] = str(a.dtype)
        if a.dtype.kind not in _NATIVE_KINDS:
            a = np.asarray(jnp.asarray(v, jnp.float32))
        stored[k] = a
    np.savez(os.path.join(out_dir, PARAMS_FILE), **stored)

    meta = {
        # preset name threaded from the CLI (Config itself is anonymous)
        "config": config_name,
        "model": cfg.model.name,
        "quant": getattr(cfg.model, "quant", "none"),
        "input_hw": list(cfg.data.input_hw),
        "raw_hw": list(raw_hw),
        "batch": batch,  # null -> polymorphic
        "platforms": list(platforms),
        "out_shape": [str(d) for d in exported.out_avals[0].shape],
        "param_count": int(sum(a.size for a in flat.values())),
        "param_dtypes": dtypes,
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
    }
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ServingModel:
    """A loaded artifact: callable raw-uint8-frames -> linear depth.

    Needs only jax — not the model code; `load_serving` never imports
    models/ or flax modules (flax.traverse_util is pure dict utils).
    """

    def __init__(self, exported, params, meta):
        self._exported = exported
        self._params = params
        self.meta = meta

    def __call__(self, img_u8):
        import jax.numpy as jnp

        return self._exported.call(self._params,
                                   jnp.asarray(img_u8, jnp.uint8))

    def predict(self, img_u8) -> np.ndarray:
        """numpy-in/numpy-out convenience; [B,H,W,3] u8 -> [B,h,w] f32."""
        return np.asarray(self(img_u8))


def load_serving(out_dir) -> ServingModel:
    """Reconstitute an exported artifact directory into a ServingModel."""
    import jax.numpy as jnp
    from flax import traverse_util
    from jax import export as jax_export

    with open(os.path.join(out_dir, META_FILE)) as f:
        meta = json.load(f)
    with open(os.path.join(out_dir, ARTIFACT_FILE), "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    with np.load(os.path.join(out_dir, PARAMS_FILE)) as npz:
        flat = {}
        for k in npz.files:
            a = npz[k]
            want = meta["param_dtypes"][k]
            if str(a.dtype) != want:
                a = jnp.asarray(a).astype(want)
            flat[k] = a
    params = traverse_util.unflatten_dict(flat, sep="/")
    return ServingModel(exported, params, meta)
