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

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
