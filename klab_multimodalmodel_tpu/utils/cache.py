"""Persistent XLA compilation cache.

Fully-unrolled transformer stacks trade compile time for runtime; the disk
cache makes that a one-time cost per (shape, config).
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    if path is None:
        # Respect a cache dir the embedding process already configured
        # (e.g. tools/multiprocess_smoke.py points each child at its own
        # dir via --compile_cache).  Overriding it from the inherited
        # KLAB_COMPILE_CACHE env var made parent + N children write one
        # directory concurrently — the zstd-corruption segfault described
        # in tests/conftest.py, reproduced at the tail of the r3 suite.
        if jax.config.jax_compilation_cache_dir:
            return
        path = os.environ.get("KLAB_COMPILE_CACHE",
                              os.path.expanduser("~/.jax_cache"))
    if jax.process_count() > 1:
        # Multi-process jobs: one writer per directory.  process_index is
        # stable across restarts, so cache reuse survives (unlike a PID
        # suffix, which would defeat the cache entirely).
        path = os.path.join(path, f"proc{jax.process_index()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
