"""A/B: serving throughput bf16 vs int8 (ops/quant.py) — encdec convs
or the DPT ViT encoder (QDense MLP + QMultiHeadAttention projections).

Same parameter tree (QConv is param-compatible with nn.Conv), dynamic
per-tensor activation scales, per-channel weight scales, int8 MXU convs.
Also reports the log-depth divergence between the two paths on one batch.

Run: python -m benchmarks.exp_int8_infer [batch] [encdec|dpt]
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main(batch=32, model_name="encdec"):
    import jax
    import jax.numpy as jnp

    from ann3depth_tpu.config import get_config
    from ann3depth_tpu.train import step as steplib
    from benchmarks import bench_infer

    if model_name == "dpt":
        from ann3depth_tpu.models.dpt import DPTDepthNet
        cfg = get_config("dpt-384")
        make = lambda quant: DPTDepthNet(remat=False, quant=quant)  # noqa: E731
    elif model_name == "encdec-w2":
        from ann3depth_tpu.models.encdec import EncDecDepthNet
        cfg = get_config("encdec-w2")
        make = lambda quant: EncDecDepthNet(width_mult=2.0, quant=quant)  # noqa: E731
    else:
        from ann3depth_tpu.models.encdec import EncDecDepthNet
        cfg = get_config("make3d-encdec")
        make = lambda quant: EncDecDepthNet(quant=quant)  # noqa: E731

    results = {"model": model_name, "batch": batch}
    for tag, quant in (("bf16", "none"), ("int8", "int8")):
        model = make(quant)
        r = bench_infer.run(cfg, batch=batch, model=model,
                            tag=f"{model_name}-{tag}", record=True)
        results[f"{tag}_images_per_sec"] = r["images_per_sec"]
        results[f"{tag}_batch_ms"] = r["batch_ms"]

    # divergence on one real forward (same params both paths)
    m_bf, m_q = make("none"), make("int8")
    params = steplib.init_params(m_bf, cfg.data.input_hw, seed=0)
    x = jnp.asarray(np.random.default_rng(3).normal(
        0, 1, (4, *cfg.data.input_hw, 3)), jnp.float32)
    y_bf = jax.device_get(jax.jit(m_bf.apply)({"params": params}, x))
    y_q = jax.device_get(jax.jit(m_q.apply)({"params": params}, x))
    d = np.abs(y_q - y_bf)
    results["mean_abs_dlogdepth"] = round(float(d.mean()), 5)
    results["max_abs_dlogdepth"] = round(float(d.max()), 5)
    results["speedup_pct"] = round(
        100 * (results["int8_images_per_sec"]
               / results["bf16_images_per_sec"] - 1), 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         sys.argv[2] if len(sys.argv) > 2 else "encdec")
