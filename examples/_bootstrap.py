"""Shared example bootstrap: honor JAX_PLATFORMS even when the environment
pins another default backend (mirrors tests/conftest.py)."""

import os

if os.environ.get("JAX_PLATFORMS"):
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass


try:
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/freefine_jax_cache"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass
