"""FLOPs / MFU accounting for the benchmarks (VERDICT r1 missing #3).

`step_flops` asks XLA itself (`lower().compile().cost_analysis()`) how many
FLOPs one compiled step executes — the honest numerator for MFU, since it
reflects the optimized HLO actually run (post-fusion, including the
on-device preprocess matmuls) rather than a hand count of the model alone.

`device_peak_flops` maps the local accelerator to its published bf16 peak
so benchmarks can report `mfu = achieved_flops / peak`. Unknown devices
(CPU, future TPUs) return None and callers omit the MFU field rather than
report a made-up denominator.
"""

from __future__ import annotations

from typing import Optional

# Published dense bf16 peak FLOP/s per chip. Ordered: most specific
# substring first (every TPU device_kind contains "v5"-style fragments).
PEAK_BF16_FLOPS = (
    ("v5 lite", 197e12),   # v5e ("TFRT TPU v5 lite" on this host)
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v6 lite", 918e12),   # Trillium
    ("v6e", 918e12),
    ("trillium", 918e12),
    ("v4", 275e12),
)

# Published int8 peak OP/s (2x bf16 on v5e/v5p/v6e; v4 has no int8 rate —
# omitted so int8 MFU on it is dropped rather than fabricated). Denominator
# for quant='int8' benchmarks (ADVICE r2: bf16 peak overstated int8 MFU ~2x).
PEAK_INT8_OPS = (
    ("v5 lite", 394e12),
    ("v5e", 394e12),
    ("v5p", 918e12),
    ("v6 lite", 1836e12),
    ("v6e", 1836e12),
    ("trillium", 1836e12),
)


def device_peak_flops(device=None, dtype: str = "bf16") -> Optional[float]:
    import jax

    d = device if device is not None else jax.devices()[0]
    kind = d.device_kind.lower()
    table = PEAK_INT8_OPS if dtype == "int8" else PEAK_BF16_FLOPS
    for key, peak in table:
        if key in kind:
            return peak
    return None


def step_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """FLOPs of one call of `jitted_fn(*args, **kwargs)` per XLA's own cost
    analysis; None when the backend doesn't report them."""
    try:
        ca = jitted_fn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:  # cost analysis is best-effort on exotic backends
        return None


def attach_memory(result: dict, device=None) -> dict:
    """Add peak HBM usage when the backend reports it (local chips do;
    the axon tunnel returns None — silently omitted there)."""
    import jax

    d = device if device is not None else jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)()
    if stats and stats.get("peak_bytes_in_use"):
        result["peak_hbm_gb"] = round(stats["peak_bytes_in_use"] / 2**30, 3)
    return result


def attach_mfu(result: dict, flops: Optional[float], steps: int,
               dt_seconds: float, dtype: str = "bf16") -> dict:
    """Extend a benchmark result dict with model_tflops / achieved_tflops /
    mfu when FLOPs (and the device peak) are known.

    dtype selects the peak denominator: "bf16" (default) or "int8" for
    quantized serving runs (v5e does 394 TOPS int8 vs 197 TFLOP/s bf16)."""
    if not flops or dt_seconds <= 0:
        return result
    achieved = flops * steps / dt_seconds
    result["model_tflops_per_step"] = round(flops / 1e12, 4)
    result["achieved_tflops"] = round(achieved / 1e12, 2)
    peak = device_peak_flops(dtype=dtype)
    if peak:
        result["mfu"] = round(achieved / peak, 4)
        if dtype != "bf16":
            result["mfu_peak_dtype"] = dtype
    return result
