"""Persistent XLA compilation cache setup.

Remote/tunneled TPU backends pay 30-60 s per jit compile; caching compiled
programs on disk makes every subsequent process start warm. Call before
the first jit execution (safe to call multiple times).
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    path = cache_dir or os.environ.get("LIGHTCTR_JAX_CACHE", DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
