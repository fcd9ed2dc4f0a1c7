"""enable_persistent_cache: the cross-CLI compile-reuse helper every
driver main() calls (round-4 VERDICT weak #5 — cold CLI recompiles)."""

import os

import jax


def test_enable_persistent_cache_sets_config(tmp_path, monkeypatch):
    from zs_aac_tpu.utils.compile_cache import enable_persistent_cache

    monkeypatch.delenv("ZS_AAC_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "cc"))
    got = enable_persistent_cache()
    assert got == str(tmp_path / "cc")
    assert jax.config.jax_compilation_cache_dir == got
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 2

    # explicit path beats env
    got2 = enable_persistent_cache(str(tmp_path / "cc2"))
    assert got2 == str(tmp_path / "cc2")


def test_enable_persistent_cache_opt_out(monkeypatch):
    from zs_aac_tpu.utils.compile_cache import enable_persistent_cache

    monkeypatch.setenv("ZS_AAC_NO_COMPILE_CACHE", "1")
    assert enable_persistent_cache() is None
