"""Persistent JAX compilation cache setup.

Epoch/GSPMD programs compile in 1-15 min on this stack (TPU compiles go
through a remote compile service; CPU GSPMD-through-vmap is slow locally),
so every entry point enables the persistent cache. The cache directory
defaults to a gitignored dir INSIDE the package checkout — /tmp is wiped
between sessions, a repo-local cache keeps later runs warm.
"""
from __future__ import annotations

import os


def enable_persistent_cache(subdir: str = ".jax_cache") -> str:
    """Point JAX's persistent compilation cache at a repo-local directory
    (override with JAX_COMPILATION_CACHE_DIR). Call before the first
    compile; safe to call repeatedly or after jax import."""
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    path = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(repo_root, subdir)
    )
    os.environ["JAX_COMPILATION_CACHE_DIR"] = path
    # jax 0.9.0 ignores the env vars — the config API is required
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
