"""Test harness: run everything on a virtual 8-device CPU mesh so the
data-parallel / sharding paths are exercised without TPU hardware (the
strategy SURVEY.md section 4 calls for — the reference has no tests at all).

The session's axon TPU plugin force-sets ``jax_platforms`` at interpreter
start via sitecustomize, which outranks the JAX_PLATFORMS env var — so the
override must go through jax.config, before any backend is initialised.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
