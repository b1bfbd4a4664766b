"""Losses, fully vectorized.

The reference's "loopy" symmetric contrastive loss iterates Python-level over
batch elements and calls ``F.cross_entropy`` per item (models.py:146-147 —
its own comment says "loopy-loopy first, then vectorized"; the vectorized
version never landed). Because every item contributes the mean CE of its
rows and all items have identical row counts, the whole thing is one
log-softmax over the stacked rows — a single fused XLA kernel here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _row_ce(logits: jax.Array) -> jax.Array:
    """Mean cross-entropy over all (…, T, T) rows with target = row index
    (the contrastive diagonal)."""
    T = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    diag = jnp.diagonal(logp, axis1=-2, axis2=-1)  # (…, T)
    return -jnp.mean(diag)


def symmetric_contrastive_loss(logits: jax.Array) -> jax.Array:
    """(N, T, T) similarity logits → scalar.

    EMG→class CE (rows) + class→EMG CE (transposed), averaged
    (reference ``Model.loss``, models.py:198-208).
    """
    loss_e = _row_ce(logits)
    loss_g = _row_ce(jnp.swapaxes(logits, -1, -2))
    return (loss_e + loss_g) / 2.0


def symmetric_contrastive_loss_per_item(logits: jax.Array) -> jax.Array:
    """(N, T, T) similarity logits → (N,) per-item symmetric CE.

    ``symmetric_contrastive_loss(logits) == per_item(logits).mean()`` exactly
    (every item contributes the same number of rows). Used by the eval path
    to weight out pad-duplicate items in the trailing partial batch.
    """
    logp_e = jax.nn.log_softmax(logits, axis=-1)
    logp_g = jax.nn.log_softmax(jnp.swapaxes(logits, -1, -2), axis=-1)
    diag_e = jnp.diagonal(logp_e, axis1=-2, axis2=-1)  # (N, T)
    diag_g = jnp.diagonal(logp_g, axis1=-2, axis2=-1)
    return -(jnp.mean(diag_e, axis=-1) + jnp.mean(diag_g, axis=-1)) / 2.0


def prediction_loss_per_item(scores: jax.Array, labels: jax.Array,
                             n_items: int) -> jax.Array:
    """(rows, C) scores + (rows,) labels, rows = n_items·k → (n_items,)
    per-item mean CE."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return ce.reshape(n_items, -1).mean(axis=-1)


def contrastive_train_accuracy(logits: jax.Array) -> jax.Array:
    """Row-argmax accuracy on the EMG→class direction
    (models.py:148-149,165)."""
    T = logits.shape[-1]
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean(pred == jnp.arange(T))


def prediction_loss(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """Plain CE for the softmax-baseline mode (models.py:175-196).

    ``scores``: (rows, C) normalized features used directly as logits;
    ``labels``: (rows,).
    """
    logp = jax.nn.log_softmax(scores, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def prediction_accuracy(scores: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean(jnp.argmax(scores, axis=-1) == labels)


def prediction_vote_accuracy(scores: jax.Array, labels: jax.Array) -> jax.Array:
    """Majority vote over the window axis: ``scores`` (rows, W, C),
    ``labels`` (rows,) (models.py:190-192). Ties break to the smallest
    class, matching ``torch.mode``."""
    C = scores.shape[-1]
    pred = jnp.argmax(scores, axis=-1)               # (rows, W)
    counts = jnp.sum(jax.nn.one_hot(pred, C), axis=1)  # (rows, C)
    maj = jnp.argmax(counts, axis=-1)
    return jnp.mean(maj == labels)
