"""Process-level runtime setup shared by every CLI entry point.

Two concerns every entry point has before its first device op:

- **Platform selection.** ``VQA_PLATFORM=cpu`` (or ``tpu``/``axon``/a
  comma list) forces the JAX platform via ``jax.config`` — the only
  override that sticks: site hooks that register out-of-tree PJRT plugins
  may call ``jax.config.update("jax_platforms", ...)`` at interpreter
  startup, which silently beats the standard ``JAX_PLATFORMS`` env var.
  Observed concretely: a relayed-TPU plugin pinning ``"axon,cpu"`` made
  ``JAX_PLATFORMS=cpu`` runs hang dialing the (down) relay.
- **Persistent compilation cache** (utils/compilation_cache.py): warm
  process starts on TPU backends where compilation is expensive.
"""

from __future__ import annotations

import os

from vqa_attention_networks_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)


def force_platform_from_env() -> str | None:
    """Apply ``VQA_PLATFORM`` if set. Must run before the first device op."""
    plat = os.environ.get("VQA_PLATFORM")
    if not plat:
        return None
    import jax

    jax.config.update("jax_platforms", plat)
    return plat


def setup() -> None:
    """Standard entry-point preamble: platform override, then cache."""
    force_platform_from_env()
    enable_persistent_cache()
