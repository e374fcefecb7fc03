"""Persistent XLA compilation cache.

TPU compiles in this deployment can take minutes (remote-compile tunnel);
the persistent cache makes every repeat invocation of the engine, bench, or
CLI with the same shapes start in seconds.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax
    cache_dir = path or os.environ.get(
        "AFIS_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
