"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices (the real TPU is a
single tunneled chip); set flags before jax initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# force CPU even when the ambient env points at a TPU backend: the suite
# (and every subprocess it spawns) must be hermetic w.r.t. tunnel state
os.environ["JAX_PLATFORMS"] = "cpu"

# persistent XLA compile cache: repeat suite runs (and the example
# subprocesses, which inherit the env var) skip recompilation
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/smol_tpu_xla_cache"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(seed=13)
