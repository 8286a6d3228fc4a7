"""Persistent XLA compilation cache (one switch for every CLI).

The SD-1.5 pipeline costs multi-minute compiles on the remote-TPU
backend; the persistent cache turns repeat runs (benchmark restarts,
per-process eval workers, resumed GeoBench sweeps) into millisecond
cache hits.  bench.py pioneered this; the eval drivers and examples all
route through here now."""

from __future__ import annotations

import os


def enable_persistent_cache(
    path: str = "~/.cache/freefine_jax_cache",
    min_compile_secs: int = 10,
) -> None:
    """Idempotent; safe no-op where the backend doesn't support it."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser(path)
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        pass
