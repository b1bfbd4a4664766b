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


def default_prng_impl() -> str:
    """Resolve ``--prng_impl auto``: the hardware RNG on TPU, threefry
    elsewhere.

    The reference's torch path draws its dropout masks from the device's
    native hardware RNG (cuRAND Philox; reference ``models.py:75-101``
    never pays a software counter-based RNG), so hardware RNG *is* the
    reference-faithful default on TPU.  Measured on v5e (bench
    ``train_prng_ab`` / ``sweep_ab``): threefry keygen inside the nine
    per-step dropout masks was the single largest removable train-step
    cost — rbg trains +37 % faster single-run and +25 % in the sweep.

    ``rbg`` streams are deterministic for a fixed key on a fixed
    backend + XLA version; pass ``--prng_impl threefry2x32`` for streams
    that are additionally stable across backends and versions (and
    byte-identical to this repo's pre-flip runs).
    """
    import jax

    return "rbg" if jax.default_backend() == "tpu" else "threefry2x32"


def add_platform_flag(parser) -> None:
    """Attach the shared ``--platform`` flag to a CLI parser."""
    parser.add_argument(
        "--platform",
        choices=list(CHOICES),
        default=None,
        help="pin the JAX backend (default: auto; env CPTPU_PLATFORM). "
        "Use --platform=cpu to run when the TPU runtime is unreachable.",
    )
