"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated with XLA's host-platform device-count fake
(the JAX fake-backend idiom) — real TPUs are not needed for correctness tests.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env pins JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon PJRT plugin ignores the env var at import time; force via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
