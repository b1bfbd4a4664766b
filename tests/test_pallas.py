"""Pallas kernels (interpret mode on CPU) vs XLA oracles, including the
custom VJP against autodiff. The same kernels are compile-validated on real
TPU hardware by scripts/tpu_kernel_check.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastiveprosthetics_tpu.ops.pallas_ops import (
    fused_contrastive_loss,
    fused_contrastive_reference,
)

N, T, D = 12, 41, 16  # N deliberately not a multiple of the 8-item block


@pytest.fixture(scope="module")
def embeddings(rng):
    e = rng.standard_normal((N, T, D)).astype(np.float32)
    g = rng.standard_normal((N, T, D)).astype(np.float32)
    e /= np.linalg.norm(e, axis=-1, keepdims=True)
    g /= np.linalg.norm(g, axis=-1, keepdims=True)
    return jnp.asarray(e), jnp.asarray(g)


def test_fused_loss_matches_reference(embeddings):
    e, g = embeddings
    loss_p, correct_p = fused_contrastive_loss(e, g, True)
    loss_r, correct_r = fused_contrastive_reference(e, g)
    np.testing.assert_allclose(float(loss_p), float(loss_r), rtol=1e-5)
    assert float(correct_p) == float(correct_r)


def test_fused_loss_matches_engine_loss(embeddings):
    """The fused loss must equal the engine's vectorized symmetric CE
    (train/loss.py)."""
    from contrastiveprosthetics_tpu.train.loss import symmetric_contrastive_loss

    e, g = embeddings
    logits = jnp.einsum("ntd,nsd->nts", e, g)
    want = float(symmetric_contrastive_loss(logits))
    loss_p, _ = fused_contrastive_loss(e, g, True)
    np.testing.assert_allclose(float(loss_p), want, rtol=1e-5)


def test_fused_loss_custom_vjp_matches_autodiff(embeddings):
    e, g = embeddings

    def fused(e, g):
        return fused_contrastive_loss(e, g, True)[0]

    def oracle(e, g):
        return fused_contrastive_reference(e, g)[0]

    ge_p, gg_p = jax.grad(fused, argnums=(0, 1))(e, g)
    ge_r, gg_r = jax.grad(oracle, argnums=(0, 1))(e, g)
    np.testing.assert_allclose(np.asarray(ge_p), np.asarray(ge_r), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gg_p), np.asarray(gg_r), rtol=1e-4, atol=1e-6)

