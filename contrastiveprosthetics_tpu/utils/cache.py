"""Persistent JAX compilation cache setup.

Epoch/GSPMD programs compile in 1-15 min on this stack (TPU compiles go
through a remote compile service; CPU GSPMD-through-vmap is slow locally),
so every entry point enables the persistent cache. The cache directory
defaults to a gitignored dir INSIDE the package checkout — /tmp is wiped
between sessions, a repo-local cache keeps later runs warm. For
non-editable installs (package under site-packages) it falls back to
``~/.cache/contrastiveprosthetics_tpu`` instead of polluting the install
tree.
"""
from __future__ import annotations

import os


def enable_persistent_cache(subdir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at a repo-local directory
    (override with JAX_COMPILATION_CACHE_DIR). ``subdir`` defaults to
    ``.jax_cache_tpu`` / ``.jax_cache_cpu`` by active backend, so CLI runs
    share the cache bench.py / the test conftest already warmed. Call
    before the first compile; safe to call repeatedly or after jax import
    (the config API is required — jax 0.9.0 ignores the env vars).

    Picking the default subdir probes ``jax.default_backend()``, which
    initializes the backend — every CLI therefore calls this only AFTER
    argparse succeeds, so ``--help``/usage-error runs never pay backend
    init (several seconds on the remote-attached TPU stack)."""
    import jax

    if subdir is None:
        subdir = (
            ".jax_cache_tpu"
            if jax.default_backend() == "tpu"
            else ".jax_cache_cpu"
        )
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if path is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        if "site-packages" in root or "dist-packages" in root:
            root = os.path.expanduser("~/.cache/contrastiveprosthetics_tpu")
        path = os.path.join(root, subdir)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = path
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
