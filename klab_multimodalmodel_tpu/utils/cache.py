"""Persistent XLA compilation cache.

Fully-unrolled transformer stacks trade compile time for runtime; the disk
cache makes that a one-time cost per (shape, config).
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("KLAB_COMPILE_CACHE",
                                  os.path.expanduser("~/.jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
