"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count); the driver separately dry-runs
the multichip path and benches on a real TPU chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize registers the 'axon' TPU platform before any
# user code runs, so the env var alone is not enough — force via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
