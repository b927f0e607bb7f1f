"""Int8 inference quantization: dynamic per-tensor activation scales,
per-output-channel weight scales, int8 x int8 -> int32 convs on the MXU.

The v5e MXU runs int8 matmuls at 2x the bf16 rate (394 vs 197 TOPS), so a
conv-dominated serving path can in principle double throughput. This
module provides:

  - `qconv`: quantize (activation, kernel) -> `lax.conv_general_dilated`
    with int8 operands and `preferred_element_type=int32`, dequantize the
    accumulator. Symmetric quantization; activation scale is computed
    per-call (dynamic — no calibration pass needed), weight scales are
    per-output-channel.
  - `QConv`: a flax module PARAM-COMPATIBLE with nn.Conv(use_bias=False)
    (same "kernel" param name/shape/f32 dtype), so a trained bf16/f32
    checkpoint runs int8 WITHOUT conversion — models/encdec.py selects it
    via `quant="int8"`.

Accuracy: symmetric per-tensor activation quant costs ~0.4% relative
error per conv on typical activations; the measured end-to-end log-depth
divergence is recorded in BASELINE.md (benchmarks/exp_int8_infer.py).
Training stays bf16 — this is a serving-path option only.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def dense_general_init(contract: str):
    """Kernel init matching flax DenseGeneral's fan computation for the
    MHA projection shapes. Bare lecun_normal misreads an (E, H, D) kernel
    (default in_axis=-2 -> fan_in H*E instead of E), mis-scaling
    from-scratch init by ~sqrt(heads); DenseGeneral computes fan from the
    contracted axes, which this reproduces.

    contract="in": (E, H, D), fan_in = E. "out": (H, D, E), fan_in = H*D.
    """
    if contract == "in":
        in_axis, out_axis = 0, (1, 2)
    else:
        in_axis, out_axis = (0, 1), 2
    return jax.nn.initializers.variance_scaling(
        1.0, "fan_in", "truncated_normal", in_axis=in_axis,
        out_axis=out_axis)


def quantize_sym(x, axis=None, bits=8):
    """Symmetric linear quantization -> (int8 values, f32 scale).

    axis=None: one scale for the whole tensor (activations).
    axis=tuple: reduce |max| over those dims (e.g. (0,1,2) for HWIO
    kernels -> per-output-channel scales).
    """
    qmax = 2.0 ** (bits - 1) - 1.0
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(amax, 1e-8) / qmax
    q = jnp.clip(jnp.round(x / scale), -qmax, qmax).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def fake_quant(x, axis=None, bits=8):
    """Float-domain quantize->dequantize with a straight-through gradient.

    Forward emits the value the int8 path would compute (round to the
    symmetric grid, clip, rescale); backward is exact identity — with
    dynamic per-tensor scales amax covers max|x|, so nothing is ever
    clipped and the classic QAT pass-through-inside-range rule reduces to
    identity. This is the training-side simulation of `qconv`/`qmatmul`
    (quantization-aware training; Jacob et al. 2018 style)."""
    qmax = 2.0 ** (bits - 1) - 1.0
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(amax, 1e-8) / qmax
    xq = jnp.clip(jnp.round(x / scale), -qmax, qmax) * scale
    return x + jax.lax.stop_gradient(xq - x)


def qconv_fake(x, kernel, strides=(1, 1), padding="SAME"):
    """QAT twin of `qconv`: fake-quantize both operands (STE), convolve in
    f32. Forward matches qconv up to f32 summation of exact int products
    (int32 accumulation vs float adds); backward is the ordinary float
    conv gradient through the STE — so training optimizes the quantized
    network directly and the int8 serving divergence collapses to ~0."""
    xf = fake_quant(x)
    kf = fake_quant(kernel, axis=(0, 1, 2))
    return jax.lax.conv_general_dilated(
        xf, kf, window_strides=tuple(strides), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def qconv(x, kernel, strides=(1, 1), padding="SAME"):
    """Int8 conv: f32/bf16 x [B,H,W,Ci], f32 kernel [kh,kw,Ci,Co] -> f32.

    Dynamic per-tensor activation scale + per-output-channel kernel
    scales; accumulation in int32 on the MXU; dequantized f32 output.
    """
    xq, sx = quantize_sym(x.astype(jnp.float32))
    kq, sk = quantize_sym(kernel.astype(jnp.float32), axis=(0, 1, 2))
    y = jax.lax.conv_general_dilated(
        xq, kq, window_strides=tuple(strides), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    # sk keepdims shape [1,1,1,Co] -> broadcast over NHWC output channels.
    return y.astype(jnp.float32) * sx * sk.reshape(1, 1, 1, -1)


def qmatmul(x, kernel):
    """Int8 matmul: f32/bf16 x [..., In], f32 kernel [In, Out] -> f32.

    Dynamic per-tensor activation scale + per-output-column kernel scales;
    int32 accumulation on the MXU (2x the bf16 rate on v5e)."""
    lead = x.shape[:-1]
    xq, sx = quantize_sym(x.astype(jnp.float32).reshape(-1, x.shape[-1]))
    kq, sk = quantize_sym(kernel.astype(jnp.float32), axis=(0,))
    y = jax.lax.dot_general(
        xq, kq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sx * sk.reshape(1, -1)).reshape(
        *lead, kernel.shape[-1])


class QDense(nn.Module):
    """Param-compatible int8 replacement for nn.Dense (kernel + bias)."""

    features: int
    out_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return (qmatmul(x, kernel) + bias).astype(self.out_dtype)


class QMultiHeadAttention(nn.Module):
    """Param-compatible int8 replacement for flax's
    nn.MultiHeadDotProductAttention (self-attention, no mask/dropout —
    the DPT usage). The q/k/v/out PROJECTIONS run int8 on the MXU
    (dynamic activation scales, per-column kernel scales); the
    attention-score/value matmuls stay bf16 (per-example T x T dynamic
    ranges make them a poor per-tensor-quant target and they are a small
    fraction of the FLOPs at 576 tokens).

    Param tree mirrors flax exactly: {query,key,value}/kernel (E, H, D) +
    bias (H, D); out/kernel (H, D, E) + bias (E,) — a checkpoint trained
    with the bf16 model loads unchanged (models/dpt.py names this module
    with flax's auto-name for that compatibility)."""

    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, t, e = x.shape
        h = self.num_heads
        d = e // h
        assert h * d == e, (e, h)

        # flax nests q/k/v/out as DenseGeneral submodule scopes; a tiny
        # inner module reproduces those exact param paths.
        class _Proj(nn.Module):
            shape: tuple  # init via dense_general_init (fan-in = E resp. H*D)
            bias_shape: tuple

            @nn.compact
            def __call__(self_inner, x, contract):
                kernel = self_inner.param(
                    "kernel", dense_general_init(contract),
                    self_inner.shape, jnp.float32)
                bias = self_inner.param(
                    "bias", nn.initializers.zeros, self_inner.bias_shape,
                    jnp.float32)
                if contract == "in":      # [.., E] @ (E, H, D)
                    y = qmatmul(x, kernel.reshape(e, h * d))
                    return y.reshape(*x.shape[:-1], h, d) + bias
                else:                     # [.., H, D] @ (H, D, E)
                    y = qmatmul(x.reshape(*x.shape[:-2], h * d),
                                kernel.reshape(h * d, e))
                    return y + bias

        q = _Proj((e, h, d), (h, d), name="query")(x, "in")
        k = _Proj((e, h, d), (h, d), name="key")(x, "in")
        v = _Proj((e, h, d), (h, d), name="value")(x, "in")

        dt = self.dtype
        q = (q / jnp.sqrt(d).astype(jnp.float32)).astype(dt)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k.astype(dt))
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v.astype(dt))
        out = _Proj((h, d, e), (e,), name="out")(o.astype(jnp.float32),
                                                 "out")
        return out.astype(dt)


class QConv(nn.Module):
    """Param-compatible int8 replacement for nn.Conv(use_bias=False).

    qat=True swaps the int8 MXU conv for its fake-quant f32 simulation
    (`qconv_fake`, STE gradients) — the TRAINING side of the int8 path;
    the param tree is identical across nn.Conv / QConv / QConv(qat), so
    one checkpoint moves freely between bf16 training, QAT fine-tuning,
    and int8 serving."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    out_dtype: jnp.dtype = jnp.bfloat16
    qat: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32)
        op = qconv_fake if self.qat else qconv
        return op(x, kernel, self.strides, self.padding).astype(
            self.out_dtype)
