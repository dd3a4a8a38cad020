"""Test env: run everything on a virtual 8-device CPU mesh (no TPU needed)."""

import os

# The ambient environment presets a TPU platform AND pre-imports jax via a
# sitecustomize hook, so plain env vars are not enough: force the CPU platform
# through jax.config after import.  XLA_FLAGS is still read at backend init,
# which has not happened yet at conftest time.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
