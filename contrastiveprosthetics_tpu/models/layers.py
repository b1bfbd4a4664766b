"""Shared layers (reference ``code/models.py:17-62``).

Notes on fidelity vs TPU-idiom:
  * ``AdaBN`` (models.py:17-35) is BatchNorm with momentum 0 and no running
    stats — i.e. *always* normalize with current-batch statistics, train and
    eval. In JAX that is simply ``use_running_average=False`` at every call;
    no state needs to be carried at all.
  * Plain-BN mode (``adabn=False``, models.py:238-243) matches
    ``torch.nn.BatchNorm``: batch stats + running-average updates in train,
    running averages in eval. Flax's ``momentum`` is the decay
    (torch ``momentum=0.1`` ⇔ flax ``momentum=0.9``).
  * ``RateDropout`` takes the rate as a *call argument* so dropout
    probabilities stay traced values — this is what lets the whole crossval
    sweep (150 configs with different rates) vmap into one XLA program.
  * Dense/Conv use torch's default init (kaiming-uniform a=√5 ⇒
    U(±1/√fan_in) for kernels and biases) so training dynamics match the
    reference's.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(−1/√fan_in, 1/√fan_in) — torch's Linear/Conv default kernel init."""
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int) -> Callable:
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """nn.Linear with torch default init. ``dtype`` is the *compute* dtype
    (bf16 for MXU-native matmuls); params stay float32."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init_for(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class TorchConv(nn.Module):
    """nn.Conv2d with torch default init, NHWC."""

    features: int
    kernel_size: Sequence[int]
    padding: Sequence[tuple[int, int]]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        for k in self.kernel_size:
            fan_in *= k
        return nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel_size),
            padding=tuple(self.padding),
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init_for(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm over all-but-last axis with the AdaBN/plain switch.

    ``adabn=True``: current-batch statistics always (reference AdaBN,
    models.py:22: ``momentum=0, track_running_stats=False``).
    ``adabn=False``: torch BatchNorm semantics (running stats in eval).
    """

    adabn: bool = True
    momentum: float = 0.9  # ⇔ torch momentum=0.1
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        use_running = (not self.adabn) and (not train)
        return nn.BatchNorm(
            use_running_average=use_running,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class RateDropout(nn.Module):
    """Dropout whose rate is a traced call argument (inverted scaling,
    matching torch.nn.Dropout)."""

    @nn.compact
    def __call__(self, x, rate, deterministic: bool):
        if deterministic:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)
