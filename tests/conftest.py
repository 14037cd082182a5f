"""Test harness: force CPU with 8 virtual devices.

Multi-chip sharding code (parallel/) is exercised on a fake 8-device CPU mesh
— the TPU-idiomatic stand-in for a pod (see SURVEY.md §4). Must run before
jax initializes, hence env mutation at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
