"""Per-epoch learning-rate factors (reference ``train.py:75-80``).

The reference steps torch schedulers once per epoch; we precompute the
factor sequence host-side (tiny, static) and feed ``factor[epoch]`` into the
jitted epoch step as a traced scalar.

Quirk (``compat_shared_steplr``): in cross-validation the reference binds
*both* StepLR handles to the glove optimizer (train.py:79-80), so the EMG lr
never decays. Default here: both decay.
"""
from __future__ import annotations

import numpy as np


def cosine_factors(epochs: int, t_max: int | None = None) -> np.ndarray:
    """torch CosineAnnealingLR(T_max, eta_min=0): lr(e) = lr0·(1+cos(πe/T))/2
    where e counts completed epochs."""
    t = t_max or max(epochs, 1)
    e = np.arange(max(epochs, 1))
    return (1.0 + np.cos(np.pi * e / t)) / 2.0


def step_factors(epochs: int, step_size: int = 5, gamma: float = 0.2) -> np.ndarray:
    """torch StepLR: lr(e) = lr0·gamma^(e//step_size)."""
    e = np.arange(max(epochs, 1))
    return gamma ** (e // step_size)


def schedule_factors(
    epochs: int, annealing: bool, compat_shared_steplr: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """(emg_factors, glove_factors) per epoch."""
    if annealing:
        f = cosine_factors(epochs)
        return f, f
    g = step_factors(epochs)
    e = np.ones_like(g) if compat_shared_steplr else g
    return e, g
