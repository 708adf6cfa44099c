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


def pytest_collection_modifyitems(config, items):
    """Data-driven quick/slow split: tests/slow_tests.txt lists nodeid
    prefixes measured >= 12 s on the 1-core image; they get the ``slow``
    marker so `pytest -m "not slow"` is the fast red/green loop (the full
    suite stays the CI bar). See the manifest header for regeneration."""
    from pathlib import Path

    manifest = Path(__file__).parent / "slow_tests.txt"
    if not manifest.exists():
        return
    prefixes = tuple(
        line.strip() for line in manifest.read_text().splitlines()
        if line.strip() and not line.startswith("#"))
    for item in items:
        nodeid = item.nodeid.replace("\\", "/")
        if not nodeid.startswith("tests/"):
            nodeid = "tests/" + nodeid
        if nodeid.split("[")[0].startswith(prefixes):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
