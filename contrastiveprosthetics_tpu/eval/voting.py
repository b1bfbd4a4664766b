"""Majority-vote evaluation, vectorized.

The reference's eval hot loop (models.py:146-163) walks every batch element
in Python and, per element, every voting-prefix length, calling
``torch.mode`` each time. Here the whole thing is one cumulative-sum over
one-hot votes: prefix-vote counts for *all* prefix lengths at once, then an
argmax whose first-max tie-break exactly reproduces ``torch.mode``'s
smallest-value-wins rule (models.py:154).

Column convention: the shipped ``voting.npy`` is (items, 24) — prefix
lengths 1..24, and ``y_pred`` is the 24-frame vote (the reference's loop
``range(1, PREDICTION_WINDOW_SIZE)`` stops one short of the full 25-frame
window; we reproduce the artifact shape).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VoteResult(NamedTuple):
    curve: jax.Array    # (B, n_prefix) accuracy per item per prefix length
    y_pred: jax.Array   # (B, T) vote at the last prefix
    y_true: jax.Array   # (B, T) = arange(T) tiled
    accuracy: jax.Array  # scalar: mean of curve[:, -1]


def vote_from_logits(logits: jax.Array, window: int, n_prefix: int) -> VoteResult:
    """``logits``: (B·window, T, T) in (batch-major, window) row order —
    the contrastive eval output. ``n_prefix``: number of voting-curve
    columns (24 canonically; 249 under ``compat_full_voting_bound``, where
    columns past the window clamp to the full-window vote exactly like the
    reference's ``pred[:win]`` slice, models.py:153-155)."""
    T = logits.shape[-1]
    B = logits.shape[0] // window
    lg = logits.reshape(B, window, T, T)
    pred = jnp.argmax(lg, axis=-1)                       # (B, W, T)
    onehot = jax.nn.one_hot(pred, T)                     # (B, W, T, T)
    counts = jnp.cumsum(onehot, axis=1)                  # prefix counts
    votes = jnp.argmax(counts, axis=-1)                  # (B, W, T) ties→min
    labels = jnp.arange(T)
    correct = votes == labels[None, None, :]             # (B, W, T)
    cols = jnp.minimum(jnp.arange(n_prefix), window - 1)  # clamp past window
    curve = jnp.mean(correct[:, cols].astype(jnp.float32), axis=-1)
    y_pred = votes[:, min(n_prefix, window) - 1]         # last-prefix vote
    y_true = jnp.broadcast_to(labels, (B, T))
    return VoteResult(
        curve=curve,
        y_pred=y_pred,
        y_true=y_true,
        accuracy=jnp.mean(curve[:, -1]),
    )


def confusion_matrix(y_true: jax.Array, y_pred: jax.Array, n_classes: int) -> jax.Array:
    """(n_classes, n_classes) counts, rows = true (sklearn convention,
    reference results.py:60)."""
    idx = y_true.reshape(-1) * n_classes + y_pred.reshape(-1)
    flat = jnp.zeros(n_classes * n_classes, jnp.int32).at[idx].add(1)
    return flat.reshape(n_classes, n_classes)
