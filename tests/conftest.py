"""Test harness: hermetic, CPU-only, 8 virtual devices for mesh tests.

The reference's test strategy is integration-only against live downloads
(/root/reference/test.py:14-38); SURVEY.md §4 calls for the opposite here —
tiny random-weight configs, no network, simulated multi-chip meshes.
"""

import os

# The environment registers the 'axon' TPU PJRT plugin from sitecustomize at
# interpreter start, overriding the JAX_PLATFORMS env var.  Forcing CPU must
# therefore go through jax.config (backends initialize lazily, so this works
# as long as it happens before the first device use).  8 virtual CPU devices
# enable simulated-mesh tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
