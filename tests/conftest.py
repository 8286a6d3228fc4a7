"""Test harness: force an 8-device virtual CPU mesh BEFORE jax is imported.

Mirrors the multi-chip design-test strategy from SURVEY.md §4: the reference
has no fake-device tests; we validate pjit/Mesh sharding on
`--xla_force_host_platform_device_count=8` CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep unit tests deterministic and fast.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(42)
