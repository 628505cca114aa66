"""Test configuration: force a virtual 8-device CPU mesh so sharding and
kernels are testable without TPU hardware (SURVEY.md §4 'Multi-chip without a
cluster').  Pallas kernels auto-select interpret mode on CPU (see
fractalrenderer_tpu.ops.pallas_utils).

Set FRACTAL_TPU_LANE=1 to SKIP the CPU forcing and run on real hardware —
the strict bit-exactness branches in test_golden_vs_kernel.py (gated on
jax.default_backend() == 'tpu') then execute instead of the loose CPU
fractions.  `python tpu_checks.py` at the repo root drives this lane.
"""
import os

TPU_LANE = os.environ.get("FRACTAL_TPU_LANE") == "1"

if not TPU_LANE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not TPU_LANE:
    # The env var alone is not enough when a TPU platform plugin (e.g. axon)
    # registers itself; force the config too.
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
