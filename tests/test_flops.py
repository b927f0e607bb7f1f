"""MFU accounting (benchmarks/flops.py): XLA cost-analysis numerator and
the attach_mfu arithmetic."""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks import flops


def test_step_flops_matches_matmul_count():
    """cost_analysis on a plain matmul ~= the analytic 2*m*n*k FLOPs."""
    m = k = n = 256

    @jax.jit
    def f(a, b):
        return a @ b

    a = jnp.zeros((m, k), jnp.float32)
    b = jnp.zeros((k, n), jnp.float32)
    got = flops.step_flops(f, a, b)
    if got is None:  # backend without cost analysis: contract is None
        return
    want = 2 * m * n * k
    assert 0.5 * want <= got <= 2.0 * want, (got, want)


def test_attach_mfu_arithmetic(monkeypatch):
    monkeypatch.setattr(flops, "device_peak_flops",
                    lambda device=None, dtype="bf16": 100e12)
    r = flops.attach_mfu({}, flops=1e12, steps=10, dt_seconds=0.5)
    # 1e12 FLOP * 10 steps / 0.5 s = 20e12 FLOP/s -> mfu 0.2 of 100e12
    assert r["model_tflops_per_step"] == 1.0
    assert r["achieved_tflops"] == 20.0
    assert r["mfu"] == 0.2


def test_attach_mfu_skips_without_flops_or_peak(monkeypatch):
    assert flops.attach_mfu({}, None, 10, 1.0) == {}
    monkeypatch.setattr(flops, "device_peak_flops",
                    lambda device=None, dtype="bf16": None)
    r = flops.attach_mfu({}, 1e12, 1, 1.0)
    assert "mfu" not in r and r["achieved_tflops"] == 1.0


def test_device_peak_flops_known_kinds():
    class FakeDev:
        def __init__(self, kind):
            self.device_kind = kind

    assert flops.device_peak_flops(FakeDev("TFRT TPU v5 lite")) == 197e12
    assert flops.device_peak_flops(FakeDev("TPU v5p")) == 459e12
    assert flops.device_peak_flops(FakeDev("cpu")) is None
    # int8 peaks (ADVICE r2: quantized serving MFU needs the 2x denominator)
    assert flops.device_peak_flops(
        FakeDev("TFRT TPU v5 lite"), dtype="int8") == 394e12
    assert flops.device_peak_flops(FakeDev("TPU v4"), dtype="int8") is None


def test_attach_mfu_int8_denominator(monkeypatch):
    def fake_peak(device=None, dtype="bf16"):
        return {"bf16": 100e12, "int8": 200e12}[dtype]
    monkeypatch.setattr(flops, "device_peak_flops", fake_peak)
    r = flops.attach_mfu({}, flops=1e12, steps=10, dt_seconds=0.5,
                         dtype="int8")
    assert r["mfu"] == 0.1 and r["mfu_peak_dtype"] == "int8"
