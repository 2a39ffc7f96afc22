"""Persistent-compilation-cache gating (utils/compilation_cache.py).

The cache must (a) stay off for CPU-first platform configs (XLA:CPU AOT
reload logs SIGILL-risk warnings on feature-mismatched hosts), (b) honour
the opt-out env var, (c) resolve the cache directory with the documented
precedence, and (d) never initialize a backend — entry points call it
before jax.distributed.initialize(), which an early backend init would
silently neuter (parallel/distributed.py).
"""

import jax

from vqa_attention_networks_tpu.utils import compilation_cache as cc


def test_cpu_platform_config_is_refused():
    # conftest pins jax_platforms=cpu for the suite
    assert cc._configured_platforms().split(",")[0].strip() == "cpu"
    assert cc.enable_persistent_cache() is None
    assert cc._enabled_dir is None


def test_env_opt_out_wins(monkeypatch):
    monkeypatch.setenv("VQA_NO_COMPILATION_CACHE", "1")
    assert cc.enable_persistent_cache() is None


def test_dir_precedence(monkeypatch, tmp_path):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    assert cc._resolve_dir(None) == cc._DEFAULT_DIR
    assert cc._resolve_dir(str(tmp_path / "arg")) == str(tmp_path / "arg")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "env"))
    # the standard JAX variable always wins
    assert cc._resolve_dir(str(tmp_path / "arg")) == str(tmp_path / "env")


def test_enable_applies_config_when_platform_is_not_cpu(monkeypatch, tmp_path):
    # simulate a TPU-first config without touching the backend: the module
    # must flip the jax_compilation_cache_dir config and report the dir
    monkeypatch.setattr(cc, "_configured_platforms", lambda: "tpu,cpu")
    monkeypatch.setattr(cc, "_enabled_dir", None)
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    before = jax.config.jax_compilation_cache_dir
    try:
        got = cc.enable_persistent_cache(str(tmp_path / "cache"))
        assert got == str(tmp_path / "cache")
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cache")
        # idempotent: a second call (even with another dir) reports the
        # directory actually in effect
        assert cc.enable_persistent_cache(str(tmp_path / "other")) == got
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
        cc._enabled_dir = None


def test_setup_never_initializes_backend():
    # regression guard for the multi-host ordering bug: cli mains run
    # runtime.setup() BEFORE jax.distributed.initialize(); any backend
    # initialization in these modules (jax.devices / default_backend) would
    # silently neuter distributed init (parallel/distributed.py NOTE)
    import inspect

    from vqa_attention_networks_tpu.utils import runtime

    src = inspect.getsource(cc) + inspect.getsource(runtime)
    for call in ("default_backend(", "jax.devices(", "local_devices("):
        assert call not in src, f"backend-initializing call {call} found"
