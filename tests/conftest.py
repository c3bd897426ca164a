"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of a fake distributed backend (the reference
has none, SURVEY.md §4): all sharding/collective paths are exercised on
XLA:CPU with 8 virtual devices so multi-chip programs compile and execute
without TPU hardware.

Must set the environment BEFORE jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
