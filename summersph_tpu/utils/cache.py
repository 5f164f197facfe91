"""Persistent XLA compilation cache setup.

First compiles through the remote TPU tunnel take minutes; the persistent
cache turns every later process start into a cache hit.  Called by the CLI,
bench, tests, and the driver entry points; respects an existing
JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os


def _host_cpu_tag() -> str:
    """Short fingerprint of this host's CPU ISA extensions.

    XLA:CPU AOT executables bake in the compile host's feature set; loading
    an entry compiled on a machine with e.g. avx512/amx onto a host without
    them SIGILLs/segfaults mid-test (observed r3: pytest segfaulted loading
    entries a previous, wider VM wrote).  CPU-platform cache entries
    therefore live in a per-fingerprint subdirectory."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return platform.machine() or "unknown"


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    cache = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
             or os.path.join(os.path.dirname(os.path.dirname(
                 os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    # CPU-forced runs (tests, tunnel-down fallbacks) get a host-specific
    # subdirectory; accelerator runs keep the shared root (their entries
    # are device code, not host code, and the warm TPU cache must survive
    # VM changes).  jax.config wins over the ambient env pin.
    try:
        platforms = jax.config.jax_platforms or os.environ.get(
            "JAX_PLATFORMS", "")
    except Exception:
        platforms = os.environ.get("JAX_PLATFORMS", "")
    if "cpu" in (platforms or "").split(","):
        cache = os.path.join(cache, f"cpu-{_host_cpu_tag()}")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run uncached


__all__ = ["enable_compile_cache"]
