"""Test configuration: run everything on a fake 8-device CPU "cluster".

This is the standard JAX stand-in for multi-chip TPU topology — sharding
and collective code paths compile and execute exactly as they would across
real chips (SURVEY.md §4).  Must run before jax is imported anywhere.
"""

import os

# The session environment pins JAX to the TPU platform plugin at interpreter
# startup (sitecustomize force-sets jax_platforms post-import), so an env var
# alone is not enough: override the config after importing jax, before any
# backend is touched.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.local_device_count() == 8, (
    f"expected fake 8-device CPU cluster, got {jax.devices()}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
