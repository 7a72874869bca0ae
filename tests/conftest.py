"""Test configuration: virtual 8-device CPU mesh + fp64 enabled.

Tests run on CPU with ``xla_force_host_platform_device_count=8`` so the
multi-chip sharding path is exercised without TPU hardware (SURVEY.md SS4),
and with x64 enabled so adjoint identities can be verified to ~1e-12 in
complex128 (TPU itself is fp32; the fp32 tolerances are tested separately).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The sandbox's sitecustomize pre-registers a TPU backend and forces
# jax_platforms; override it back to CPU for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(42)
