"""Framework utilities."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA compilations across processes. The search/self-play
    programs take minutes to compile cold on TPU; with the cache they load
    in seconds on every subsequent run (bench, CLI, training restarts)."""
    import jax

    path = path or os.path.expanduser("~/.cache/connect4_tpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
