"""CLIP-style wrapper (reference ``Model``, ``code/models.py:66-228``).

Owns both encoders and produces the similarity logits. Differences from the
reference, by design:
  * No Python loops anywhere — the per-item "loopy" cross-entropy and the
    voting-prefix loop live in ``train/loss.py`` / ``eval/voting.py`` as
    fully vectorized XLA ops.
  * ``logit_scale`` is omitted: in the reference it is initialized to exactly
    0 and its multiplication is commented out (models.py:81,129) — dead.
  * Eval (vote) mode is driven by input rank: (B, T, W, 12) windows produce
    (B·W, T, T) logits in (batch-major, window) row order, matching the
    reference's reshape/transpose dance (models.py:337-341,463-464).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrastiveprosthetics_tpu.models.emg_net import EMGNet
from contrastiveprosthetics_tpu.models.glove_net import GLOVENet


def _l2_normalize(x, axis=-1, eps=0.0):
    # reference normalizes with plain .norm() (models.py:123-125), no eps
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / n


class ContrastiveModel(nn.Module):
    d_e: int = 16
    emg_dim: int = 12
    glove_dim: int = 20
    n_classes: int = 41
    adabn: bool = True
    prediction: bool = False
    glove: bool = False            # prediction mode: classify from glove
    glove_encoding: bool = False   # contrastive: encode angles, not one-hot
    dtype: jnp.dtype = jnp.float32  # encoder compute dtype (bf16 for MXU)
    # architecture knobs (defaults = reference parity, models.py:266-298);
    # tests shrink these to keep CPU GSPMD compiles tractable
    n_linear: int = 7
    hidden: int = 512

    def setup(self):
        self.emg_net = EMGNet(
            d_e=self.d_e,
            emg_dim=self.emg_dim,
            n_classes=self.n_classes,
            adabn=self.adabn,
            prediction=self.prediction,
            n_linear=self.n_linear,
            hidden=self.hidden,
            dtype=self.dtype,
        )
        self.glove_net = GLOVENet(
            d_e=self.d_e,
            glove_dim=self.glove_dim,
            n_classes=self.n_classes,
            adabn=self.adabn,
            prediction=self.prediction,
            glove_encoding=self.glove_encoding,
        )

    def encode_emg(self, frames, train: bool = False):
        """(rows, emg_dim) → (rows, d_e) normalized embeddings — the serving
        path (one encoder call per streamed frame batch)."""
        return _l2_normalize(self.emg_net(frames, 0.0, train))

    def encode_classes(self, glove_rows=None, train: bool = False):
        """(n_classes, d_e) normalized class embeddings. One-hot path by
        default; pass glove prototypes (n_classes, glove_dim) in
        glove_encoding mode for zero-shot class specification."""
        labels = jnp.arange(self.n_classes)
        if glove_rows is None:
            glove_rows = jnp.zeros((self.n_classes, self.glove_dim))
        return _l2_normalize(
            self.glove_net(glove_rows, labels, 0.0, train)
        )

    def embed(self, emg, glove, dp_emg, dp_glove, train: bool):
        """Train-mode embeddings for the fused Pallas loss: returns
        normalized (e, g), both (B, T, d_e) — the similarity+CE then runs
        in one kernel without materializing logits (ops/pallas_ops.py)."""
        B, T = emg.shape[:2]
        frames = emg.reshape(-1, self.emg_dim)
        labels = jnp.tile(jnp.arange(T), B)
        e = self.emg_net(frames, dp_emg, train).reshape(B, T, self.d_e)
        g = self.glove_net(
            glove.reshape(-1, self.glove_dim), labels, dp_glove, train
        ).reshape(B, T, self.d_e)
        return _l2_normalize(e), _l2_normalize(g)

    def embed_glove(self, glove, dp_glove, train: bool):
        """The glove half of :meth:`embed` alone: (B, T, glove_dim) →
        normalized (B, T, d_e). Used by the fused-training path
        (ops/train_fused.py), where the EMG tower runs through the
        Pallas chain and only the class tower needs flax."""
        B, T = glove.shape[:2]
        labels = jnp.tile(jnp.arange(T), B)
        g = self.glove_net(
            glove.reshape(-1, self.glove_dim), labels, dp_glove, train
        ).reshape(B, T, self.d_e)
        return _l2_normalize(g)

    def __call__(self, emg, glove, dp_emg, dp_glove, train: bool):
        """``emg``: (B, T, emg_dim) train or (B, T, W, emg_dim) eval-vote.
        ``glove``: (B, T, glove_dim). Labels are implicitly ``arange(T)``
        per item (reference ``TaskWrapper.__getitem__``, utils.py:54).

        Contrastive: returns logits (B[, ·W], T, T).
        Prediction: returns normalized class scores (rows, n_classes) with
        rows = B·T (train) or (B·T, W) (eval-vote).
        """
        vote = emg.ndim == 4
        if vote:
            B, T, W, _ = emg.shape
        else:
            B, T = emg.shape[:2]
            W = 1
        frames = emg.reshape(-1, self.emg_dim)            # (B·T·W, 12)
        labels = jnp.tile(jnp.arange(T), B)               # (B·T,)

        if self.prediction:
            if self.glove:
                feats = self.glove_net(
                    glove.reshape(-1, self.glove_dim), labels, dp_glove, train
                )
            else:
                feats = self.emg_net(frames, dp_emg, train)
            feats = _l2_normalize(feats)
            if vote and not self.glove:
                feats = feats.reshape(B * T, W, self.n_classes)
            return feats

        e = self.emg_net(frames, dp_emg, train)            # (B·T·W, d_e)
        if vote:
            # (B, T, W, d) → (B, W, T, d) → (B·W, T, d)  (models.py:337-341)
            e = e.reshape(B, T, W, self.d_e).transpose(0, 2, 1, 3)
            e = e.reshape(B * W, T, self.d_e)
        else:
            e = e.reshape(B, T, self.d_e)
        e = _l2_normalize(e)

        g = self.glove_net(
            glove.reshape(-1, self.glove_dim), labels, dp_glove, train
        )                                                  # (B·T, d_e)
        g = g.reshape(B, T, self.d_e)
        if vote:
            # expand along vote frames (models.py:463-464)
            g = jnp.broadcast_to(g[:, None], (B, W, T, self.d_e))
            g = g.reshape(B * W, T, self.d_e)
        g = _l2_normalize(g)

        # (N, T_e, d) × (N, T_g, d) → (N, T_e, T_g)  (models.py:127-129)
        return jnp.einsum("ntd,nsd->nts", e, g)


def l2_penalty(params) -> jax.Array:
    """Σ‖W‖_F over non-BatchNorm, non-bias parameters of a subtree
    (reference ``EMGNet.l2``/``GLOVENet.l2``, models.py:344-349,467-472 —
    note: Frobenius *norm*, not squared)."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if any("BatchNorm" in str(n) for n in names):
            continue
        if names and str(names[-1]) == "bias":
            continue
        total = total + jnp.linalg.norm(leaf.reshape(-1))
    return total
