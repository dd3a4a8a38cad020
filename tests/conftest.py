"""Test env: run everything on a virtual 8-device CPU mesh (no TPU needed)."""

import os

# must happen before jax is imported anywhere (the ambient env may preset a
# TPU platform; tests always run on the virtual CPU mesh)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
