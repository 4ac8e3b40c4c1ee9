"""Persistent-compile-cache helper: TPU-only enablement, idempotence,
opt-out.

The cache is deliberately DISABLED on the CPU backend: jax 0.9's XLA:CPU
AOT executable serialization segfaulted full-suite runs both loading
foreign-host entries and writing fresh ones (see the helper's docstring);
only the tunneled TPU — where compiles cost minutes — uses it.
"""
import os

from probabilistic_point_clouds_registration_tpu.utils import compile_cache


def test_enable_on_tpu_backend(tmp_path, monkeypatch):
    import jax

    prev = jax.config.jax_compilation_cache_dir
    prev_flag = compile_cache._enabled
    try:
        compile_cache._enabled = False
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("HOME", str(tmp_path))
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert compile_cache.enable_persistent_compilation_cache()
        assert jax.config.jax_compilation_cache_dir is not None
        assert compile_cache.enable_persistent_compilation_cache()  # idempotent
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        compile_cache._enabled = prev_flag


def test_disabled_on_cpu_backend():
    """This suite runs on the CPU backend — enable must refuse (the XLA:CPU
    AOT serialize/deserialize segfault class) and leave the config unset."""
    import jax

    prev = jax.config.jax_compilation_cache_dir
    prev_flag = compile_cache._enabled
    try:
        compile_cache._enabled = False
        jax.config.update("jax_compilation_cache_dir", None)
        assert jax.default_backend() == "cpu"
        assert not compile_cache.enable_persistent_compilation_cache()
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        compile_cache._enabled = prev_flag


def test_opt_out(monkeypatch):
    import jax

    prev = jax.config.jax_compilation_cache_dir
    prev_flag = compile_cache._enabled
    try:
        compile_cache._enabled = False
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("PCR_TPU_NO_COMPILE_CACHE", "1")
        assert not compile_cache.enable_persistent_compilation_cache()
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        compile_cache._enabled = prev_flag
