"""Class encoder (reference ``GLOVENet``, ``code/models.py:352-472``).

Contrastive path (the shipped configuration): the glove *values* are ignored
— the class embedding is ``Dense(n_classes → d_e)`` applied to the one-hot
label (models.py:411-414, 457-458). Glove-angle encodings are the reference's
stated future direction (README.md:19); here the ``glove_encoding`` switch
turns them on: a small MLP over the 20 glove angles produces the class
embedding, enabling zero-shot-style class specification.

Prediction+glove path: the reference's head is dimensionally broken (its
``last`` expects 256 features but receives 20, models.py:416-428 — it would
crash if run); we implement the evident intent: MLP 20→128→ReLU→BN→Dropout→
Dense(128→n_classes, no bias).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrastiveprosthetics_tpu.models.layers import (
    BatchNorm,
    RateDropout,
    TorchDense,
)


class GLOVENet(nn.Module):
    d_e: int = 16
    glove_dim: int = 20
    n_classes: int = 41
    adabn: bool = True
    prediction: bool = False
    glove_encoding: bool = False  # encode real glove angles, not one-hot
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, glove, labels, dropout_rate, train: bool):
        """``glove``: (rows, glove_dim); ``labels``: (rows,) int class ids.
        Returns (rows, bits)."""
        if self.prediction:
            x = glove.reshape(-1, self.glove_dim)
            x = TorchDense(128)(x)
            x = nn.relu(x)
            x = BatchNorm(adabn=self.adabn)(x, train)
            x = RateDropout()(x, dropout_rate, deterministic=not train)
            return TorchDense(self.n_classes, use_bias=False)(x)

        if self.glove_encoding:
            x = glove.reshape(-1, self.glove_dim)
            x = TorchDense(128)(x)
            x = nn.relu(x)
            x = BatchNorm(adabn=self.adabn)(x, train)
            x = RateDropout()(x, dropout_rate, deterministic=not train)
            return TorchDense(self.d_e, use_bias=False)(x)

        # one-hot "easy" class embedding (models.py:411-414,457-458)
        hot = jax.nn.one_hot(labels, self.n_classes, dtype=jnp.float32)
        return TorchDense(self.d_e)(hot)
