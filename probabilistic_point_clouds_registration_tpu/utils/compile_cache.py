"""Persistent XLA compilation cache, enabled once per process.

The registration programs are static-shape-specialized (padded cloud size,
bucket capacity, neighbor count), and each specialization costs minutes on a
remote TPU compiler. Sequence odometry re-specializes whenever consecutive
scans land in a different size/capacity class, so a durable on-disk cache is
the difference between compiling a handful of classes once per machine and
once per process. Opt out with PCR_TPU_NO_COMPILE_CACHE=1.
"""
from __future__ import annotations

import os
from pathlib import Path

_enabled = False


def enable_persistent_compilation_cache() -> bool:
    """Idempotently point JAX's compilation cache at ~/.jax_cache.

    Respects an already-configured cache dir and the opt-out env var.
    Returns True when a cache directory is active after the call.
    """
    global _enabled
    if _enabled:
        return True
    if os.environ.get("PCR_TPU_NO_COMPILE_CACHE"):
        return False
    import jax

    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:
        return False
    if current:
        _enabled = True
        return True
    try:
        path = Path.home() / ".jax_cache"
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _enabled = True
        return True
    except Exception:
        return False
