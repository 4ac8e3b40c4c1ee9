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


def _host_fingerprint() -> str:
    """Short hash of the host CPU's feature flags (/proc/cpuinfo)."""
    import hashlib

    try:
        for line in Path("/proc/cpuinfo").read_text().splitlines():
            if line.startswith("flags"):
                flags = " ".join(sorted(line.split(":", 1)[1].split()))
                return hashlib.sha1(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def enable_persistent_compilation_cache() -> bool:
    """Idempotently point JAX's compilation cache at a durable directory.

    TPU programs cache at ~/.jax_cache (the remote compiler's output is
    host-independent). CPU-backend processes use a HOST-FINGERPRINTED
    directory instead: XLA:CPU persists AOT executables whose cache key
    does NOT include the host machine features, so entries written by a
    container scheduled on different hardware SEGFAULT at load (observed:
    cpu_aot_loader "machine feature ... not supported on the host machine"
    errors followed by SIGSEGV inside backend_compile_and_load). A
    per-CPU-flags directory makes a re-scheduled container recompile
    instead of loading foreign machine code.

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
        if jax.default_backend() == "cpu":
            path = Path.home() / f".jax_cache_cpu_{_host_fingerprint()}"
        else:
            path = Path.home() / ".jax_cache"
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _enabled = True
        return True
    except Exception:
        return False
