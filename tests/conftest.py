"""Test harness: hermetic, CPU-only, 8 virtual devices for mesh tests.

The reference's test strategy is integration-only against live downloads
(/root/reference/test.py:14-38); SURVEY.md §4 calls for the opposite here —
tiny random-weight configs, no network, simulated multi-chip meshes.
"""

import os

# The session presets JAX_PLATFORMS=axon (the real TPU tunnel); tests must be
# hermetic and deterministic, so force CPU — explicit assignment, not
# setdefault.  f32 on CPU is exact; on TPU matmuls default to bf16 passes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
