"""DPT time decomposition: ViT encoder vs fusion head vs full forward.

DPT-384 trains at hw MFU 0.44 — this locates the other half. Times three
jitted programs (scan-of-K, device_get sync) with fresh params:
  encoder : patchify + 12 transformer blocks on [B, 576, 384]
  head    : reassemble + 3 fusion stages + conv head from 4 fake taps
  full    : the real DPTDepthNet forward
Timing-only mock of the head structure (mirrors models/dpt.py shapes) —
parity is NOT asserted here, only where the milliseconds go.

Run: python -m benchmarks.exp_dpt_profile [batch]
"""

from __future__ import annotations

import json
import sys
import time

import flax.linen as nn
import numpy as np


def _time_scan(fn, x, K=20, iters=4):
    import jax
    import jax.numpy as jnp

    # Perturb the input with the loop index: a loop-invariant input lets
    # XLA hoist fn out of the scan body entirely (observed: a "0.336 ms"
    # 12-block ViT forward = 729 TFLOP/s, i.e. DCE'd, not computed).
    def perturb(v, i):
        return v + (i.astype(jnp.float32) * 1e-6).astype(v.dtype)

    def one(c, i):
        if isinstance(x, tuple):
            y = fn(tuple(perturb(v, i) for v in x))
        else:
            y = fn(perturb(x, i))
        return c + y.reshape(-1)[0].astype(jnp.float32), None

    @jax.jit
    def run(c):
        return jax.lax.scan(one, c, jnp.arange(K))

    c = jnp.zeros((), jnp.float32)
    for _ in range(2):
        c, _ = run(c)
    float(jax.device_get(c))
    t0 = time.perf_counter()
    for _ in range(iters):
        c, _ = run(c)
    float(jax.device_get(c))
    return (time.perf_counter() - t0) / iters / K * 1e3


def main(batch=8):
    import jax
    import jax.numpy as jnp

    from ann3depth_tpu.models.dpt import Block, DPTDepthNet, FusionBlock, _up

    dt = jnp.bfloat16
    rng = jax.random.key(0)
    results = {}

    # --- full forward ---
    full = DPTDepthNet(remat=False)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (batch, 384, 384, 3)), jnp.float32)
    pf = full.init(rng, x)["params"]
    results["full_fwd_ms"] = round(
        _time_scan(lambda v: full.apply({"params": pf}, v), x), 3)

    # --- encoder only: patchify + 12 blocks ---
    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, x):
            tok = nn.Conv(384, (16, 16), strides=(16, 16), dtype=dt,
                          name="patch_embed")(x.astype(dt))
            b = tok.shape[0]
            tok = tok.reshape(b, 24 * 24, 384)
            for i in range(12):
                tok = Block(384, 6, dtype=dt, name=f"block{i}")(tok)
            return tok

    enc = Encoder()
    pe = enc.init(rng, x)["params"]
    results["encoder_fwd_ms"] = round(
        _time_scan(lambda v: enc.apply({"params": pe}, v), x), 3)

    # --- head only: reassemble + fusion + conv head from 4 taps ---
    class Head(nn.Module):
        @nn.compact
        def __call__(self, taps):
            skips = [nn.Conv(128, (1, 1), dtype=dt, name=f"reassemble{i}")(
                t.reshape(t.shape[0], 24, 24, 384)) for i, t in
                enumerate(taps)]
            y = skips[-1]
            y = FusionBlock(128, dtype=dt, name="fuse3")(y, skips[-2])
            y = FusionBlock(128, dtype=dt, name="fuse2")(
                y, _up(skips[-3], 2, dt))
            y = FusionBlock(128, dtype=dt, name="fuse1")(
                y, _up(skips[-4], 4, dt))
            y = nn.Conv(64, (3, 3), padding="SAME", dtype=dt,
                        name="head1")(y)
            y = nn.relu(y)
            y = nn.Conv(1, (3, 3), padding="SAME", dtype=jnp.float32,
                        name="head2")(y.astype(jnp.float32))
            b2, hh, ww, _ = y.shape
            return jax.image.resize(y, (b2, hh * 2, ww * 2, 1),
                                    method="bilinear")

    taps = tuple(jnp.asarray(np.random.default_rng(i).normal(
        0, 1, (batch, 576, 384)), dt) for i in range(4))
    head = Head()
    ph = head.init(rng, taps)["params"]
    results["head_fwd_ms"] = round(
        _time_scan(lambda t: head.apply({"params": ph}, t), taps), 3)

    results["residual_ms"] = round(
        results["full_fwd_ms"] - results["encoder_fwd_ms"]
        - results["head_fwd_ms"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
