"""Shared example bootstrap: honor JAX_PLATFORMS even when the environment
pins another default backend (mirrors tests/conftest.py)."""

import os

if os.environ.get("JAX_PLATFORMS"):
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
