"""Test harness: force an 8-device virtual CPU mesh BEFORE backends init.

Mirrors the multi-chip design-test strategy from SURVEY.md §4: the reference
has no fake-device tests; we validate pjit/Mesh sharding on
`--xla_force_host_platform_device_count=8` CPU devices.

Note: this environment registers a remote-TPU ('axon') PJRT backend at
interpreter start via sitecustomize and forces `jax_platforms=axon,cpu`, so
plain `JAX_PLATFORMS=cpu` in the env is not enough — we must re-point
`jax_platforms` at import time, before any computation initializes backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The axon boot path flips the default PRNG to 'rbg'; tests pin threefry for
# reproducible golden values.
jax.config.update("jax_default_prng_impl", "threefry2x32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(42)
