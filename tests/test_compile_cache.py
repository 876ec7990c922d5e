"""utils/compile_cache.py: the persistent-XLA-cache CLI default."""

import os

import jax
import pytest

from nerf_tpu.utils import enable_compilation_cache


@pytest.fixture(autouse=True)
def _restore_cache_config():
    prev = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


def test_enables_default_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.setenv("NERF_COMPILE_CACHE", str(tmp_path / "cache"))
    path = enable_compilation_cache()
    assert path == str(tmp_path / "cache")
    assert os.path.isdir(path)
    assert jax.config.jax_compilation_cache_dir == path


def test_off_knob_disables(monkeypatch):
    monkeypatch.setenv("NERF_COMPILE_CACHE", "off")
    assert enable_compilation_cache() == ""


def test_jax_env_var_wins(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "jaxdir"))
    monkeypatch.delenv("NERF_COMPILE_CACHE", raising=False)
    path = enable_compilation_cache()
    assert path == str(tmp_path / "jaxdir")
    assert os.path.isdir(path)
