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
    """Idempotently point JAX's compilation cache at ~/.jax_cache — for
    NON-CPU backends only.

    The cache exists for the tunneled TPU, where each static-shape
    specialization costs minutes on the remote compiler. It is DISABLED on
    the CPU backend: jax 0.9's XLA:CPU AOT executable serialization is
    unreliable here — three full-suite runs died with SIGSEGV inside the
    cache machinery (once in backend_compile_and_load loading an entry
    compiled on a different host CPU after a container reschedule —
    cpu_aot_loader "machine feature ... not supported on the host machine"
    — and once in put_executable_and_time serializing a freshly compiled
    program even with a host-scoped cache directory). CPU compiles are
    seconds, not minutes; stability wins.

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
    if jax.default_backend() == "cpu":
        return False
    try:
        path = Path.home() / ".jax_cache"
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _enabled = True
        return True
    except Exception:
        return False
