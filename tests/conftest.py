"""Test harness: force CPU with 8 virtual devices.

Multi-chip sharding code (parallel/) is exercised on a fake 8-device CPU mesh
— the TPU-idiomatic stand-in for a pod (see SURVEY.md §4). jax may already be
imported by site customization before conftest runs, so we use
``jax.config.update`` (honored until the backend is first initialized) rather
than environment variables.
"""

import os

import jax

if not os.environ.get("NIT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# CLI mains enable the persistent XLA compilation cache by default
# (~/.cache/...); tests must not write artifacts into the real user home.
os.environ.setdefault("NIT_COMPILATION_CACHE", "off")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    if not os.environ.get("NIT_TEST_TPU"):
        assert jax.default_backend() == "cpu", (
            "tests must run on CPU; backend initialized too early: "
            + jax.default_backend()
        )
        assert len(jax.devices()) == 8
    yield
