"""sEMG encoder (reference ``EMGNet``, ``code/models.py:230-349``).

Architecture (faithful): the 12-channel instantaneous frame is treated as a
1×12 one-channel image → Conv(1→64, 3×3, pad 1) → ReLU → BN → Conv(64→64)
→ ReLU → BN → flatten (768) → 7 × [Dense 512 → ReLU → BN (+ Dropout on the
last 4 blocks)] → head. Heads: contrastive projection Dense(512→d_e, no
bias) (models.py:312-315) or prediction Dense(512→128)→ReLU→BN→Dense(128→41,
no bias) (models.py:300-309).

TPU notes: all rows across (batch × tasks × vote-frames) are flattened into
one big matmul batch — the MXU sees (N·41[·25], 512)×(512, 512) GEMMs, and
XLA fuses ReLU/BN/dropout into them. Dropout rate is traced (vmap-able
across crossval configs).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from contrastiveprosthetics_tpu.models.layers import (
    BatchNorm,
    RateDropout,
    TorchConv,
    TorchDense,
)


class EMGNet(nn.Module):
    d_e: int = 16
    emg_dim: int = 12
    n_classes: int = 41
    adabn: bool = True
    prediction: bool = False
    n_linear: int = 7
    hidden: int = 512
    conv_features: int = 64
    dtype: jnp.dtype = jnp.float32  # compute dtype (bf16 ⇒ MXU-native)

    @nn.compact
    def __call__(self, frames, dropout_rate, train: bool):
        """``frames``: (rows, emg_dim) flattened instantaneous frames.
        Returns (rows, bits) float32 embeddings (bits = d_e or n_classes)."""
        dt = self.dtype
        x = frames.astype(dt).reshape(-1, 1, self.emg_dim, 1)  # NHWC 1×12
        x = TorchConv(self.conv_features, (3, 3), ((1, 1), (1, 1)), dtype=dt)(x)
        x = nn.relu(x)
        x = BatchNorm(adabn=self.adabn, dtype=dt)(x, train)
        x = TorchConv(self.conv_features, (3, 3), ((1, 1), (1, 1)), dtype=dt)(x)
        x = nn.relu(x)
        x = BatchNorm(adabn=self.adabn, dtype=dt)(x, train)
        x = x.reshape(x.shape[0], -1)  # (rows, 12·64)

        for i in range(self.n_linear):
            x = TorchDense(self.hidden, dtype=dt)(x)
            x = nn.relu(x)
            x = BatchNorm(adabn=self.adabn, dtype=dt)(x, train)
            if i >= self.n_linear - 4:  # dropout on last 4 blocks
                x = RateDropout()(x, dropout_rate, deterministic=not train)

        if self.prediction:
            x = TorchDense(128, dtype=dt)(x)
            x = nn.relu(x)
            x = BatchNorm(adabn=self.adabn, dtype=dt)(x, train)
            x = TorchDense(self.n_classes, use_bias=False, dtype=dt)(x)
        else:
            x = TorchDense(self.d_e, use_bias=False, dtype=dt)(x)
        # embeddings return to f32 for normalization/similarity/loss
        return x.astype(jnp.float32)
