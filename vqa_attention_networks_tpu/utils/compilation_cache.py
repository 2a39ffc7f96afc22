"""Persistent XLA compilation cache for every entry point.

The reference pays no compile cost (PyTorch eager); under XLA the first
flagship compile is tens of seconds on a TPU VM and can run to MINUTES when
compilation is relayed (remote-compile backends). JAX ships a persistent
on-disk executable cache that turns every subsequent process start into a
cache hit — this module is the one place that switches it on, so the train
CLI, the serving CLIs, and bench.py all share one warm cache.

Opt-out with VQA_NO_COMPILATION_CACHE=1; redirect with
JAX_COMPILATION_CACHE_DIR (the standard JAX variable, which always wins).

TPU-only by design: XLA:CPU executables are AOT-compiled against the build
host's exact CPU features, and reloading them on a host whose feature
detection disagrees logs "could lead to SIGILL" warnings (observed on this
environment's CPU) — CPU runs recompile in well under a second anyway, so
caching buys nothing there.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "vqa_attention_networks_tpu", "xla"
)

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the cache directory in use, or None when disabled/unavailable.
    """
    global _enabled
    if os.environ.get("VQA_NO_COMPILATION_CACHE"):
        return None
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        return None
    if backend not in ("tpu", "axon"):
        return None

    path = (
        os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or cache_dir
        or _DEFAULT_DIR
    )
    if _enabled:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything, not just >1s compiles: the relayed-compile cost
        # is dominated by round trips, not compile CPU time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # unknown option on an old/odd jax — run uncached
        return None
    _enabled = True
    return path
