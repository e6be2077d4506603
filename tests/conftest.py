"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on the CPU backend with
``xla_force_host_platform_device_count`` standing in for a pod slice (the
real-hardware bench runs separately on the TPU chip).
"""

import os

# XLA_FLAGS must be in the environment before the CPU backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU plugin overrides the JAX_PLATFORMS env var, so select
# the CPU backend through the config API (this also keeps tests from claiming
# the single real TPU chip and blocking concurrent bench runs).
jax.config.update("jax_platforms", "cpu")

# f64 on the CPU backend lets tests compare Jacobians against finite
# differences tightly; library code is dtype-polymorphic and runs f32 on TPU.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
