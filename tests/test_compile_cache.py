"""Persistent compile cache wiring (ctdd_tpu/utils/compile_cache.py)."""

import os

from ctdd_tpu.utils.compile_cache import enable_compile_cache


def test_enable_sets_cache_dir(tmp_path, monkeypatch):
    target = str(tmp_path / "cc")
    monkeypatch.setenv("CTDD_COMPILE_CACHE", target)
    assert enable_compile_cache() == target
    assert os.path.isdir(target)
    import jax

    assert jax.config.jax_compilation_cache_dir == target


def test_disable_with_zero(monkeypatch):
    monkeypatch.setenv("CTDD_COMPILE_CACHE", "0")
    assert enable_compile_cache() is None
