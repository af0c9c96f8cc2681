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

# Persistent compilation cache: the quick suite spends most of its single
# CPU core compiling the same tiny-model programs run after run.  Cached
# compiles are keyed on jax version + backend + program, so reuse is safe;
# opt out with PHI3V_TPU_TEST_CC="".
_cc = os.environ.get("PHI3V_TPU_TEST_CC", "/root/.cache/jax_comp_cpu")
if _cc:
    jax.config.update("jax_compilation_cache_dir", _cc)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
