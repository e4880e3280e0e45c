"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4 implication).

Note: this environment force-sets JAX_PLATFORMS=axon,cpu at interpreter
startup, so the env var alone is not enough — jax.config is updated directly
before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped: each test sees the same deterministic stream whether
    # run alone or in the full suite
    return np.random.default_rng(1993)
