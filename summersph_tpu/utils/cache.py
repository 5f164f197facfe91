"""Persistent XLA compilation cache setup.

First compiles through the remote TPU tunnel take minutes; the persistent
cache turns every later process start into a cache hit.  Called by the CLI,
bench, tests, and the driver entry points; respects an existing
JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    cache = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
             or os.path.join(os.path.dirname(os.path.dirname(
                 os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run uncached


__all__ = ["enable_compile_cache"]
