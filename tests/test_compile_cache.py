"""Persistent XLA compile cache wiring (compile_cache.py)."""

import importlib
import os

import whisperlivekit_tpu.compile_cache as cc


def test_enable_sets_jax_config(tmp_path, monkeypatch):
    importlib.reload(cc)
    monkeypatch.delenv("WLK_XLA_CACHE", raising=False)
    p = str(tmp_path / "xla")
    got = cc.enable_compile_cache(p)
    assert got == p and os.path.isdir(p)
    import jax

    assert jax.config.jax_compilation_cache_dir == p
    # idempotent: second call returns the already-enabled path
    assert cc.enable_compile_cache("/elsewhere") == p


def test_opt_out(monkeypatch, tmp_path):
    importlib.reload(cc)
    monkeypatch.setenv("WLK_XLA_CACHE", "0")
    assert cc.enable_compile_cache(str(tmp_path / "x")) is None
    assert not (tmp_path / "x").exists()
