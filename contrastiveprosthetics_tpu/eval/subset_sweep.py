"""Prediction-set-size sweep — the headline analysis (reference README.md:15,
``results.png``, ``data/{mean,min,max,std}_grasp.xlsx``).

**Reconstruction note.** The computing script is absent from the reference
snapshot (only its output artifacts shipped); the semantics below are
reverse-engineered from those artifacts:

  * 41-row output, row 0 = 0.0 placeholder, rows 1..40 = set sizes.
  * size-1 mean accuracy 0.814 (< 1.0) ⇒ the candidate set must contain
    more than the single chosen grasp — rest (class 0) is always a
    candidate: a prosthesis can always relax.
  * size-40 mean 0.2692 ≈ the *frame-level* accuracy (voting-curve prefix-1
    is 0.2729) and ≠ the voted accuracy 0.3394 ⇒ the sweep consumes the raw
    per-frame logits (``logs.npy``), not the majority votes.
  * size-40 std 1.0e-5 over 144 trials ⇒ at full size the subset is
    deterministic up to ordering; the ~2e-5 spread is argmax tie-breaking
    under candidate permutation (1-2 flipped rows out of 48·25·41).

Sweep: for each size s ∈ 1..40, 144 trials; each trial samples s distinct
non-rest classes, candidates = subset ∪ {rest}; rows whose true class is a
candidate are classified by restricted argmax; accuracy = mean correct.
Fully vectorized: all sizes × trials evaluated as one masked-argmax batch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SweepResult(NamedTuple):
    mean: np.ndarray  # (n_classes,) rows: 0 placeholder, sizes 1..n-1
    min: np.ndarray
    max: np.ndarray
    std: np.ndarray
    raw: np.ndarray   # (n_sizes, trials) per-trial accuracies


def _subset_masks(
    rng: np.random.Generator, n_classes: int, trials: int
) -> np.ndarray:
    """(n_sizes, trials, n_classes) bool candidate masks; rest (class 0)
    always on; sizes 1..n_classes-1 over the non-rest classes."""
    n_grasps = n_classes - 1
    masks = np.zeros((n_grasps, trials, n_classes), dtype=bool)
    for si, size in enumerate(range(1, n_grasps + 1)):
        for t in range(trials):
            chosen = rng.choice(np.arange(1, n_classes), size=size, replace=False)
            masks[si, t, chosen] = True
            masks[si, t, 0] = True
    return masks


@jax.jit
def _trial_accuracy(logits: jax.Array, mask: jax.Array) -> jax.Array:
    """One candidate mask over all rows.

    ``logits``: (rows, n_classes) scores, with ``true[r] = r % n_classes``
    (rows are (item, frame, true-class) in canonical order).
    """
    n_classes = logits.shape[-1]
    true = jnp.arange(logits.shape[0]) % n_classes
    neg = jnp.finfo(logits.dtype).min
    restricted = jnp.where(mask[None, :], logits, neg)
    pred = jnp.argmax(restricted, axis=-1)
    row_in = mask[true]
    correct = (pred == true) & row_in
    return jnp.sum(correct) / jnp.maximum(jnp.sum(row_in), 1)


def subset_size_sweep(
    logits: np.ndarray,
    trials: int = 144,
    seed: int = 0,
) -> SweepResult:
    """``logits``: (n_rows, n_classes, n_classes) frame-level similarity
    matrices (the ``logs.npy`` layout: rows = eval items × vote frames,
    each containing one score row per true class)."""
    n_classes = logits.shape[-1]
    flat = jnp.asarray(logits.reshape(-1, n_classes), jnp.float32)
    rng = np.random.default_rng(seed)
    masks = _subset_masks(rng, n_classes, trials)

    acc_fn = jax.jit(
        jax.vmap(jax.vmap(lambda m: _trial_accuracy(flat, m)))
    )
    raw = np.asarray(acc_fn(jnp.asarray(masks)))  # (n_sizes, trials)

    pad = lambda v: np.concatenate([[0.0], v])
    return SweepResult(
        mean=pad(raw.mean(axis=1)),
        min=pad(raw.min(axis=1)),
        max=pad(raw.max(axis=1)),
        std=pad(raw.std(axis=1)),
        raw=raw,
    )
