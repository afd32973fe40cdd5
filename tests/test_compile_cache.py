"""Persistent compilation cache wiring (utils/compile_cache.py)."""

import jax

from jpeg2png_tpu.utils.compile_cache import enable_persistent_cache


def test_enable_sets_cache_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("JPEG2PNG_TPU_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR",
                       str(tmp_path / "xla-cache"))
    prev = jax.config.jax_compilation_cache_dir
    try:
        path = enable_persistent_cache()
        assert path == str(tmp_path / "xla-cache")
        assert jax.config.jax_compilation_cache_dir == path
        import os
        assert os.path.isdir(path)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_kill_switch(monkeypatch):
    monkeypatch.setenv("JPEG2PNG_TPU_NO_COMPILE_CACHE", "1")
    prev = jax.config.jax_compilation_cache_dir
    assert enable_persistent_cache() is None
    assert jax.config.jax_compilation_cache_dir == prev


def test_default_location(monkeypatch, tmp_path):
    monkeypatch.delenv("JPEG2PNG_TPU_NO_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    prev = jax.config.jax_compilation_cache_dir
    try:
        path = enable_persistent_cache()
        assert path == str(tmp_path / "jpeg2png_tpu" / "xla")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
