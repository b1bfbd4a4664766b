"""Backend (platform) selection for CLI entry points.

The reference is hard-wired to one CUDA device (reference ``utils.py:19``,
``models.py:67``); the TPU rebuild instead lets JAX pick the best backend.
That default is right until the remote-attached TPU runtime (the ``axon``
plugin) is unreachable: backend init then hangs for minutes before failing,
and the plugin registers itself regardless of the ``JAX_PLATFORMS``
environment variable, so there is no out-of-process way to fall back.

``select_platform`` gives every CLI an in-process escape hatch: it must run
after ``argparse`` succeeds and **before the first JAX backend use** (in
particular before ``utils.cache.enable_persistent_cache``, which probes
``jax.default_backend()``).  Resolution order: explicit ``--platform`` flag,
then the ``CPTPU_PLATFORM`` environment variable, then JAX's own choice.
"""
from __future__ import annotations

import os

ENV_VAR = "CPTPU_PLATFORM"
CHOICES = ("auto", "cpu", "tpu")


def select_platform(choice: str | None = None) -> str:
    """Pin the JAX backend before first use; returns the resolved choice.

    ``auto`` (or ``None`` with no ``CPTPU_PLATFORM``) leaves the decision
    to JAX.  Anything else is passed to ``jax.config.update`` — the only
    mechanism the axon plugin respects (it ignores the ``JAX_PLATFORMS``
    environment variable).
    """
    resolved = choice or os.environ.get(ENV_VAR) or "auto"
    resolved = resolved.lower()
    if resolved not in CHOICES:
        raise ValueError(
            f"platform must be one of {CHOICES}, got {resolved!r}"
        )
    if resolved != "auto":
        import jax

        jax.config.update("jax_platforms", resolved)
    return resolved


def add_platform_flag(parser) -> None:
    """Attach the shared ``--platform`` flag to a CLI parser."""
    parser.add_argument(
        "--platform",
        choices=list(CHOICES),
        default=None,
        help="pin the JAX backend (default: auto; env CPTPU_PLATFORM). "
        "Use --platform=cpu to run when the TPU runtime is unreachable.",
    )
