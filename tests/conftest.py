"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding/collective code is tested without TPUs the standard
way: force the host CPU platform and fake 8 devices via XLA_FLAGS. Must run
before the first `import jax` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: CPU XLA compiles of the conv nets are slow
# (~45 s for a small encoder); cache them across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU through
# the config API so the 8-device mesh tests really run on 8 fake devices.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
