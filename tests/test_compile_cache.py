"""Persistent-compile-cache helper: idempotence and opt-out."""
import os

from probabilistic_point_clouds_registration_tpu.utils import compile_cache


def test_enable_and_idempotent(tmp_path, monkeypatch):
    import jax

    prev = jax.config.jax_compilation_cache_dir
    prev_flag = compile_cache._enabled
    try:
        compile_cache._enabled = False
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("HOME", str(tmp_path))
        assert compile_cache.enable_persistent_compilation_cache()
        assert jax.config.jax_compilation_cache_dir is not None
        assert compile_cache.enable_persistent_compilation_cache()  # idempotent
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
