"""Test configuration: force a virtual 8-device CPU mesh so sharding and
kernels are testable without TPU hardware (SURVEY.md §4 'Multi-chip without a
cluster').  Pallas kernels auto-select interpret mode on CPU (see
fractalrenderer_tpu.ops.pallas_utils)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The env var alone is not enough when a TPU platform plugin (e.g. axon)
# registers itself; force the config too.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
