"""Per-task sampling as pure index math (reference ``TaskWrapper``,
``utils.py:21-76``).

The reference builds, per epoch, a per-task random permutation matrix on
device (``rand().argsort() + task_offset``, ``utils.py:34-36``); each item
``idx`` then yields one random window of *every* task — a (n_tasks, …) slab —
with labels ``arange(n_tasks)``. We keep exactly that scheme, jax.random
flavored: everything is an index matrix, every batch is one fused gather, and
a whole epoch of batches is a single array the training ``lax.scan``
iterates over.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def task_permutations(key: jax.Array, n_tasks: int, D: int) -> jax.Array:
    """(n_tasks, D) int32 — row ``t`` is a permutation of ``[tD, (t+1)D)``
    (reference ``TaskWrapper.return_rand``, utils.py:34-36)."""
    keys = jax.random.split(key, n_tasks)
    perms = jax.vmap(lambda k: jax.random.permutation(k, D))(keys)
    offsets = (jnp.arange(n_tasks, dtype=perms.dtype) * D)[:, None]
    return perms + offsets


def identity_permutations(n_tasks: int, D: int) -> jax.Array:
    """(n_tasks, D) int32 — row ``t`` is the *identity* ``[tD, (t+1)D)``.

    Deterministic counterpart of :func:`task_permutations` for evaluations
    that must preserve the item axis ordering (per-subject AdaBN eval:
    eval items are (person, rep, group) row-major per load.py:233-240, so a
    subject's windows are one contiguous block only under identity
    indexing)."""
    return (
        jnp.arange(n_tasks, dtype=jnp.int32)[:, None] * D
        + jnp.arange(D, dtype=jnp.int32)[None, :]
    )


def epoch_batches(
    key: jax.Array, D: int, batch_size: int
) -> tuple[jax.Array, jax.Array]:
    """``(batches, tail)`` item indices for one epoch.

    Equivalent to DataLoader(shuffle=True, drop_last=False) over the D
    items (``train.py:86``; torch's drop_last default is False, so the
    reference TRAINS the trailing partial batch). ``batches`` is
    (n_batches, bs) full batches; ``tail`` is the (D % bs,)-shaped
    remainder — a genuinely smaller final batch, exactly the reference's
    semantics (its BN statistics come from the small batch alone, not a
    padded one). Both shapes are static: D and bs are Python ints, so the
    remainder costs one extra in-graph body instantiation, not a dynamic
    shape. ``batch_size`` is clamped to D. With the canonical geometry
    (D=1800/bs=8) the tail is empty; at the CLI default bs=32 it carries
    the 8 items that were silently dropped before round 3.
    """
    bs = min(batch_size, D)
    order = jax.random.permutation(key, D)
    n_batches = D // bs
    return (
        order[: n_batches * bs].reshape(n_batches, bs),
        order[n_batches * bs:],
    )


def epoch_batches_padded(key: jax.Array, D: int, batch_size: int):
    """Like :func:`epoch_batches` but covers *every* item: the trailing
    partial batch is padded by wrapping the permutation, and a parallel
    float32 weight matrix marks the pad duplicates with 0.

    Returns ``(batches, weights, inverse)`` where ``batches`` is
    (n_batches, bs) item ids, ``weights`` is (n_batches, bs) ∈ {0, 1}, and
    ``inverse`` is the length-D inverse permutation mapping item id → its
    first-occurrence position in ``batches.reshape(-1)`` (used to un-shuffle
    per-item outputs back to item order; eval is the DataLoader
    drop_last=False semantics of train.py:32,51).
    """
    bs = min(batch_size, D)
    order = jax.random.permutation(key, D)
    n_batches = -(-D // bs)
    pad = n_batches * bs - D
    order_padded = jnp.concatenate([order, order[:pad]]) if pad else order
    weights = jnp.concatenate(
        [jnp.ones((D,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
    )
    inverse = (
        jnp.zeros((D,), order.dtype).at[order].set(jnp.arange(D, dtype=order.dtype))
    )
    return (
        order_padded.reshape(n_batches, bs),
        weights.reshape(n_batches, bs),
        inverse,
    )


def gather_train_batch(
    emg_flat: jax.Array, emg_rand: jax.Array, items: jax.Array
) -> jax.Array:
    """(bs, n_tasks, emg_dim) — one window per task per item
    (reference ``utils.py:51-64`` + ``load.py:256-259``)."""
    idx = emg_rand[:, items].T  # (bs, n_tasks)
    return emg_flat[idx]


def gather_eval_batch(
    emg_groups: jax.Array, emg_rand: jax.Array, items: jax.Array
) -> jax.Array:
    """(bs, n_tasks, output_dim, emg_dim) — one voting group per task per
    item (reference ``load.py:264-266``)."""
    idx = emg_rand[:, items].T
    return emg_groups[idx]


def gather_glove_batch(
    glove_flat: jax.Array, glove_rand: jax.Array, items: jax.Array, D_glove: int
) -> jax.Array:
    """(bs, n_tasks, glove_dim) (reference ``utils.py:53``: glove items wrap
    modulo the glove corpus size)."""
    idx = glove_rand[:, items % D_glove].T
    return glove_flat[idx]
