"""Persistent JAX compilation cache setup.

First compiles through this environment's remote-compile tunnel cost minutes;
the persistent cache makes every later process start warm. Called by the
entry points (ckmain, filecheck, bench) before first device use.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/camkifu_jax")


def enable(cache_dir: str = DEFAULT_DIR) -> None:
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax or read-only home: run without the cache
