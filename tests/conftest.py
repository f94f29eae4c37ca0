"""Test harness: run everything on a virtual 8-device CPU mesh so the
data-parallel / sharding paths are exercised without TPU hardware (the
strategy SURVEY.md section 4 calls for — the reference has no tests at all)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env pins a remote TPU; tests force CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
