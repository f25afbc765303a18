"""Test harness config: force CPU with 8 virtual devices so multi-chip
sharding is exercised without TPU hardware.  Must run before jax imports."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# sitecustomize may import jax before this file runs, freezing the platform
# choice from the outer env — override through the live config instead.
jax.config.update("jax_platforms", "cpu")

# fp32 parity tests need true fp32 contractions (the platform default may
# use bf16-passes); production code paths run in bf16 explicitly.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
