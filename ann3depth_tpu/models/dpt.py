"""DPT-style ViT depth model at 384x384 — the stretch config [B:11].

A dense-prediction transformer in the spirit of Ranftl et al. 2021
("Vision Transformers for Dense Prediction"): patchify -> ViT encoder ->
reassemble tokens from several depths into image-like feature maps ->
convolutional fusion decoder -> log-depth at full input resolution.

TPU-first design notes:
- 16x16 patches at 384x384 -> 24x24 = 576 tokens: tiny sequence, so plain
  dot-product attention compiles straight onto the MXU; no blockwise /
  flash attention warranted (SURVEY §5 "Long-context" — decision recorded
  there), jax.nn.dot_product_attention handles fusion.
- bf16 compute / f32 params; LayerNorms and the head in f32.
- Token reassembly is reshape-only (24x24 grid), upsampling in the fusion
  head is jax.image.resize + conv (same rationale as models/encdec.py).
- remat-able blocks for HBM headroom at batch (config uses remat=True).
- The "model" mesh axis (parallel/mesh.py) is reserved for sharding
  attention heads / MLP if this is ever scaled up; at this size DP-only is
  optimal.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16
    quant: str = "none"  # int8 serving path (ops/quant.QDense)

    @nn.compact
    def __call__(self, x):
        if self.quant == "int8":
            from ann3depth_tpu.ops.quant import QDense
            # explicit names = flax's auto-names for the bf16 branch, so
            # the param tree (and the TP rules keyed on Dense_0/Dense_1 —
            # parallel/sharding_rules.py) is identical either way.
            x = QDense(self.hidden, out_dtype=self.dtype, name="Dense_0")(x)
            x = nn.gelu(x)
            return QDense(self.dim, out_dtype=self.dtype, name="Dense_1")(x)
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x)
        return nn.Dense(self.dim, dtype=self.dtype)(x)


def _jnn_attention(query, key, value, bias=None, mask=None, **_kw):
    """flax attention_fn adapter for jax.nn.dot_product_attention (the
    XLA-fused SDPA path). Same [B, T, H, D] layout; DPT uses no mask/bias
    and no dropout (deterministic=True)."""
    del bias, mask
    return jax.nn.dot_product_attention(query, key, value)


class FusedQKVSelfAttention(nn.Module):
    """Self-attention with the q/k/v projections as ONE fused MXU matmul.

    Param tree mirrors flax's nn.MultiHeadDotProductAttention exactly
    ({query,key,value}/kernel (E,H,D) + bias (H,D); out/kernel (H,D,E) +
    bias (E,)) so checkpoints are interchangeable with the "flax" impl.
    The three projection kernels are concatenated at apply time into one
    [E, 3E] operand: one [B*T,E]x[E,3E] matmul instead of three
    [B*T,E]x[E,E].

    MEASURED AND REJECTED (r3, benchmarks/exp_dpt_qkv.py, b16): train
    -2.4%, serving -4.8% vs the flax path. The concatenate cannot be
    folded away — kernels are runtime inputs, so XLA materializes the
    [E,3E] operand each step and the copies cost more than the wider-N
    matmul saves at E=384. Kept as a tested, param-compatible capability
    (checkpoints interchange with "flax"); "flax" stays the default.
    """

    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, t, e = x.shape
        h = self.num_heads
        d = e // h
        assert h * d == e, (e, h)

        # flax nests q/k/v/out as DenseGeneral submodule scopes; a tiny
        # inner module reproduces those exact param paths (the
        # ops/quant.QMultiHeadAttention pattern). Init must match
        # DenseGeneral's fan computation (ops/quant.dense_general_init):
        # bare lecun_normal on an (E,H,D) kernel mis-scales by ~sqrt(h).
        from ann3depth_tpu.ops.quant import dense_general_init

        class _P(nn.Module):
            shape: tuple
            bias_shape: tuple
            contract: str

            @nn.compact
            def __call__(self_inner):
                kern = self_inner.param(
                    "kernel", dense_general_init(self_inner.contract),
                    self_inner.shape, jnp.float32)
                bias = self_inner.param(
                    "bias", nn.initializers.zeros, self_inner.bias_shape,
                    jnp.float32)
                return kern, bias

        qk, qb = _P((e, h, d), (h, d), "in", name="query")()
        kk, kb = _P((e, h, d), (h, d), "in", name="key")()
        vk, vb = _P((e, h, d), (h, d), "in", name="value")()

        dt = self.dtype
        wqkv = jnp.concatenate(
            [qk.reshape(e, e), kk.reshape(e, e), vk.reshape(e, e)],
            axis=1).astype(dt)
        bqkv = jnp.concatenate(
            [qb.reshape(e), kb.reshape(e), vb.reshape(e)]).astype(dt)
        y = x.astype(dt) @ wqkv + bqkv                      # [B, T, 3E]
        q, k, v = (p.reshape(b, t, h, d) for p in jnp.split(y, 3, axis=-1))

        # Same attention math as the flax path: scaled scores in compute
        # dtype, f32 softmax (flax promotes reductions the same way).
        q = q / jnp.asarray(jnp.sqrt(d), dt)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v)

        ok, ob = _P((h, d, e), (e,), "out", name="out")()
        out = o.reshape(b, t, e) @ ok.reshape(e, e).astype(dt)
        return out + ob.astype(dt)


class Block(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.bfloat16
    # "flax" | "jnn" | "fused" — same params, same math either way
    attention_impl: str = "flax"
    quant: str = "none"           # int8 serving (q/k/v/out + MLP matmuls)

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        if self.quant == "int8":
            from ann3depth_tpu.ops.quant import QMultiHeadAttention
            # named with flax's auto-name so the bf16-trained param tree
            # loads unchanged (ops/quant.QMultiHeadAttention docstring)
            y = QMultiHeadAttention(
                num_heads=self.heads, dtype=self.dtype,
                name="MultiHeadDotProductAttention_0")(y)
        elif self.attention_impl == "fused":
            y = FusedQKVSelfAttention(
                num_heads=self.heads, dtype=self.dtype,
                name="MultiHeadDotProductAttention_0")(y)
        else:
            attn_kw = ({"attention_fn": _jnn_attention}
                       if self.attention_impl == "jnn" else {})
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=self.dtype, deterministic=True,
                **attn_kw)(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32)(x).astype(self.dtype)
        return x + MLP(self.dim, self.dim * 4, dtype=self.dtype,
                       quant=self.quant)(y)


class FusionBlock(nn.Module):
    """DPT-style refinement: merge an upsampled coarser path with a
    reassembled skip, then refine with convs."""
    features: int
    dtype: jnp.dtype = jnp.bfloat16
    upsample: str = "resize"  # "matmul" | "resize" (identical math)
    upsample_out: bool = True  # False: merge+refine only, stay at in-res

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + nn.Conv(self.features, (3, 3), padding="SAME",
                            dtype=self.dtype, use_bias=False)(skip)
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    use_bias=False)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    use_bias=False)(y)
        x = x + y
        if not self.upsample_out:
            return x
        return _up(x, 2, self.dtype, impl=self.upsample)


class DPTDepthNet(nn.Module):
    """ViT-S-ish encoder + DPT fusion head -> log-depth at input res."""

    patch: int = 16
    dim: int = 384
    depth: int = 12
    heads: int = 6
    fusion_features: int = 128
    tap_layers: Sequence[int] = (2, 5, 8, 11)  # reassembled skip depths
    compute_dtype: jnp.dtype = jnp.bfloat16
    remat: bool = True
    upsample: str = "resize"  # fusion-head x2/x4: "matmul" | "resize"
    attention_impl: str = "flax"  # inner SDPA: "flax" | "jnn"
    # int8 serving for the ViT ENCODER (q/k/v/out + MLP matmuls via
    # ops/quant.py; same param tree as bf16 training). The fusion head
    # stays bf16 — it is HBM-bandwidth-bound (design.md §2b). MEASURED
    # AND REJECTED for this model (r3, BASELINE.md): −14.7% at b16 —
    # dynamic quantize overhead on 384-dim matmuls beats the int8 MXU
    # rate. The knob stays as the tested capability + the measurement's
    # documentation; bf16 is the recommended DPT serving path.
    quant: str = "none"
    # Coarsest feature resolution the head runs at before the 1-channel
    # bilinear to full res. 2 (default): finest fusion stage emits 192²
    # maps. 4: the head stays at 96² (all 4 taps still consumed; fuse1
    # merges without its output upsample) — the fusion head is
    # HBM-bandwidth-bound at 192² (benchmarks/exp_dpt_profile.py), so
    # this trades finest-stage capacity for ~bytes/4 at the top stage.
    # PRICED (r3 convergence study, benchmarks/exp_convergence.py): on
    # trained weights stride 4 costs +46.9% eval RMSE for +14% train /
    # +27.6% serve throughput — quality-expensive, stays non-default.
    head_stride: int = 2

    OUTPUT_STRIDE = 1  # full-resolution depth out

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] normalized f32 (H, W divisible by patch)."""
        dt = self.compute_dtype
        b, h, w, _ = x.shape
        gh, gw = h // self.patch, w // self.patch
        # 4 fusion stages x2 upsampling each must recover the 16x patch
        # stride exactly.
        assert len(self.tap_layers) == 4 and self.patch == 16, (
            "DPT head is built for patch=16 with 4 reassembled taps")

        # Patchify: conv with patch-size kernel/stride = linear projection.
        tok = nn.Conv(self.dim, (self.patch, self.patch),
                      strides=(self.patch, self.patch), dtype=dt,
                      name="patch_embed")(x.astype(dt))
        tok = tok.reshape(b, gh * gw, self.dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw, self.dim), jnp.float32)
        tok = tok + pos.astype(dt)

        block = nn.remat(Block) if self.remat else Block
        taps = []
        for i in range(self.depth):
            tok = block(self.dim, self.heads, dtype=dt,
                        attention_impl=self.attention_impl,
                        quant=self.quant,
                        name=f"block{i}")(tok)
            if i in self.tap_layers:
                taps.append(tok)

        # Reassemble token taps into [B, gh, gw, C] maps, project, fuse
        # coarse-to-fine with 2x upsampling per stage: gh -> H.
        def reassemble(t, name):
            m = t.reshape(b, gh, gw, self.dim)
            return nn.Conv(self.fusion_features, (1, 1), dtype=dt,
                           name=name)(m)

        skips = [reassemble(t, f"reassemble{i}") for i, t in enumerate(taps)]

        # Fusion runs to stride 2 (3 upsampling stages); the final x2 to
        # full resolution happens on the 1-channel depth map — feature maps
        # at 384^2 were the dominant cost of the head (DPT itself predicts
        # below input resolution and resizes).
        # Monotonic deepest-to-shallowest skip order (standard DPT): the
        # coarsest refinement consumes the deepest remaining tap.
        fuse = nn.remat(FusionBlock) if self.remat else FusionBlock
        ups = self.upsample
        assert self.head_stride in (2, 4), self.head_stride
        coarse = self.head_stride == 4
        y = skips[-1]
        y = fuse(self.fusion_features, dtype=dt, upsample=ups,
                 name="fuse3")(y, skips[-2])                            # 2x
        y = fuse(self.fusion_features, dtype=dt, upsample=ups,
                 name="fuse2")(y, _up(skips[-3], 2, dt, impl=ups))      # 4x
        # Finest stage always merges the last tap at 96² (skip x4); at
        # head_stride 2 it then upsamples to 192², at 4 it stays at 96²
        # (bandwidth lever, see head_stride docstring).
        y = fuse(self.fusion_features, dtype=dt, upsample=ups,
                 upsample_out=not coarse, name="fuse1")(
                     y, _up(skips[-4], 4, dt, impl=ups))

        y = nn.Conv(64, (3, 3), padding="SAME", dtype=dt, name="head1")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (3, 3), padding="SAME", dtype=jnp.float32,
                    name="head2")(y.astype(jnp.float32))
        b2, hh, ww, _ = y.shape
        f = self.head_stride
        return jax.image.resize(y, (b2, hh * f, ww * f, 1), method="bilinear")

    @staticmethod
    def output_hw(input_hw):
        return tuple(input_hw)


def _up(x, factor, dt, impl="resize"):
    if impl == "matmul":
        from ann3depth_tpu.ops.resize import upsample_matmul
        return upsample_matmul(x.astype(dt), factor)
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c),
                            method="bilinear").astype(dt)
