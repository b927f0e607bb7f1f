"""Test harness config: force an 8-device fake CPU mesh (SURVEY.md §4.6).

Must set XLA flags before jax initializes its backends, hence module-level
os.environ mutation in conftest (imported before any test module).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env presets axon (TPU) here
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Persistent XLA compile cache: CPU compiles of the jitted train steps
# dominate suite wall-clock; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_debug_nans", False)  # enabled per-test where useful

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_mesh():
    from ann3depth_tpu.parallel import mesh as meshlib
    return meshlib.create_mesh(jax.devices("cpu"))
