"""Persistent XLA compilation cache for every entry point.

The reference pays no compile cost (PyTorch eager); under XLA the first
flagship compile is tens of seconds on a TPU VM and can run to MINUTES when
compilation is relayed (remote-compile backends). JAX ships a persistent
on-disk executable cache that turns every subsequent process start into a
cache hit — this module is the one place that switches it on, so the train
CLI, the serving CLIs, and bench.py all share one warm cache.

Opt-out with VQA_NO_COMPILATION_CACHE=1; redirect with
JAX_COMPILATION_CACHE_DIR (the standard JAX variable, which always wins).

Not enabled for CPU-first platform configs: XLA:CPU executables are
AOT-compiled against the build host's exact CPU features, and reloading
them on a host whose feature detection disagrees logs "could lead to
SIGILL" warnings (observed on this environment's CPU) — CPU compiles are
sub-second anyway. The platform check reads only *configuration*
(jax.config / env), never an initialized backend: entry points must be able
to call this BEFORE jax.distributed.initialize(), and touching the device
or backend query APIs first would turn distributed init into a silent
no-op (see parallel/distributed.py).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "vqa_attention_networks_tpu", "xla"
)

_enabled_dir: str | None = None


def _configured_platforms() -> str:
    """The platform priority list from config/env, WITHOUT backend init."""
    import jax

    try:
        value = jax.config.jax_platforms  # set by site hooks / VQA_PLATFORM
    except AttributeError:
        value = None
    return value or os.environ.get("JAX_PLATFORMS", "")


def _resolve_dir(cache_dir: str | None) -> str:
    """Precedence: JAX_COMPILATION_CACHE_DIR > explicit arg > default."""
    return (
        os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or cache_dir
        or _DEFAULT_DIR
    )


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the cache directory in use, or None when disabled/unavailable.
    Never initializes a backend (safe before jax.distributed.initialize).
    """
    global _enabled_dir
    if os.environ.get("VQA_NO_COMPILATION_CACHE"):
        return None
    if _enabled_dir is not None:
        return _enabled_dir

    first = _configured_platforms().split(",")[0].strip().lower()
    if first == "cpu":
        return None

    import jax

    path = _resolve_dir(cache_dir)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything, not just >1s compiles: the relayed-compile cost
        # is dominated by round trips, not compile CPU time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # unknown option on an old/odd jax — run uncached
        return None
    _enabled_dir = path
    return path
