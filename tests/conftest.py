"""Test harness config: run everything on a virtual 8-device CPU mesh.

This substitutes for a real pod slice (SURVEY.md §4c): multi-device sharding
tests exercise the same pjit/shard_map programs that run on TPU hardware.

Note: the environment's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon, so env vars alone are too late — we must override via
jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fp32 matmuls for numeric comparisons against numpy oracles
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
