"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (the standard TPU-world answer to testing
distribution; see SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard-pin: the ambient env may set axon/tpu
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers a TPU backend and forces
# jax_platforms=axon regardless of the env var; override it back.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def has_reference() -> bool:
    return os.path.isdir(REFERENCE)


def reference_path() -> str:
    return REFERENCE
