"""Model registry: name -> constructor (SURVEY.md §2.1 "Model registry").

The reference selected architectures by name from the CLI; this preserves
that surface. All models share one contract:

    model(x: [B,H,W,3] normalized f32) -> [B,h,w,1] log-depth f32

with `h, w = model_cls.output_hw((H, W))`. Predicting *log*-depth keeps the
scale-invariant loss polynomial in the network output (train/losses.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from ann3depth_tpu.config import ModelConfig

_REGISTRY = {}


def register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def available():
    return sorted(_REGISTRY)


def build(cfg: ModelConfig):
    """Instantiate the Flax module for a ModelConfig."""
    try:
        ctor = _REGISTRY[cfg.name]
    except KeyError:
        raise KeyError(f"unknown model {cfg.name!r}; have {available()}")
    if getattr(cfg, "quant", "none") != "none" and not (
            cfg.name == "encdec" or cfg.name.startswith("dpt")):
        # Only encdec and the dpt family have quantized serving twins
        # (ops/quant.py); failing loudly beats benchmarking bf16 under an
        # int8 label (ADVICE r2).
        raise ValueError(
            f"quant={cfg.quant!r} is only supported by 'encdec' and the "
            f"dpt family, not {cfg.name!r}")
    if getattr(cfg, "quant", "none") == "int8-qat" and cfg.name != "encdec":
        # DPT int8 serving was measured and rejected (-14.7%, BASELINE.md),
        # so training for it would be pointless.
        raise ValueError("quant='int8-qat' is encdec-only (DPT int8 "
                         "serving is a measured throughput loss)")
    return ctor(cfg)


def _dtype(cfg: ModelConfig):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]


@register("small")
def _small(cfg: ModelConfig):
    from ann3depth_tpu.models.small_depth import SmallDepthNet
    return SmallDepthNet(width_mult=cfg.width_mult, compute_dtype=_dtype(cfg))


@register("encdec")
def _encdec(cfg: ModelConfig):
    from ann3depth_tpu.models.encdec import EncDecDepthNet
    return EncDecDepthNet(width_mult=cfg.width_mult, compute_dtype=_dtype(cfg),
                          remat=cfg.remat,
                          quant=getattr(cfg, "quant", "none"))


@register("multiscale")
def _multiscale(cfg: ModelConfig):
    from ann3depth_tpu.models.multiscale import MultiScaleDepthNet
    return MultiScaleDepthNet(width_mult=cfg.width_mult,
                              compute_dtype=_dtype(cfg), remat=cfg.remat)


@register("dpt")
def _dpt(cfg: ModelConfig):
    from ann3depth_tpu.models.dpt import DPTDepthNet
    return DPTDepthNet(compute_dtype=_dtype(cfg), remat=cfg.remat,
                       quant=getattr(cfg, "quant", "none"))


@register("dpt-small")
def _dpt_small(cfg: ModelConfig):
    """Tiny ViT variant of the DPT family: the CPU-viable smoke/debug
    counterpart to 'small' for the transformer path (also the loop-level
    tensor-parallel test vehicle — 4 heads / 512 MLP hidden shard over
    tp=2 or 4)."""
    from ann3depth_tpu.models.dpt import DPTDepthNet
    return DPTDepthNet(dim=128, depth=6, heads=4, fusion_features=64,
                       tap_layers=(1, 2, 4, 5),
                       compute_dtype=_dtype(cfg), remat=cfg.remat,
                       quant=getattr(cfg, "quant", "none"))


def output_hw(name: str, input_hw):
    """Static output shape for a registered model at a given input size."""
    if name == "small":
        from ann3depth_tpu.models.small_depth import SmallDepthNet
        return SmallDepthNet.output_hw(input_hw)
    if name == "encdec":
        from ann3depth_tpu.models.encdec import EncDecDepthNet
        return EncDecDepthNet.output_hw(input_hw)
    if name == "multiscale":
        from ann3depth_tpu.models.multiscale import MultiScaleDepthNet
        return MultiScaleDepthNet.output_hw(input_hw)
    if name in ("dpt", "dpt-small"):
        from ann3depth_tpu.models.dpt import DPTDepthNet
        return DPTDepthNet.output_hw(input_hw)
    raise KeyError(name)


def s2d_input_factor(name: str) -> int:
    """Space-to-depth factor of pre-s2d input the model's stem accepts
    directly (0 = RGB only). The XLA preprocess can emit that layout in
    place (ops/pallas_preprocess.oracle_preprocess_s2d), fusing the stem
    relayout into the resize matmuls — train/loop.py wires it."""
    if name == "encdec":
        from ann3depth_tpu.models.encdec import EncDecDepthNet
        return EncDecDepthNet.S2D_INPUT_FACTOR
    if name == "multiscale":
        from ann3depth_tpu.models.multiscale import MultiScaleDepthNet
        return MultiScaleDepthNet.S2D_INPUT_FACTOR
    return 0
