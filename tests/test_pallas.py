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
def embeddings():
    rng = np.random.default_rng(1234)  # own stream: module scope
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


# ===================================================================
# fused whole-encoder inference forward
# ===================================================================


@pytest.fixture(scope="module")
def inference_model():
    """Plain-BN model with non-trivial running stats + params, plus the
    frames: the fixed-normalization inference configuration the fused
    encoder targets (narrow: n_linear=2/hidden=64 keeps CPU fast; the
    fold is architecture-generic)."""
    from contrastiveprosthetics_tpu.models.clip import ContrastiveModel

    rng = np.random.default_rng(1234)  # own stream: module scope

    model = ContrastiveModel(adabn=False, n_linear=2, hidden=64)
    key = jax.random.PRNGKey(7)
    variables = model.init(
        {"params": key},
        jnp.zeros((2, 41, 12)), jnp.zeros((2, 41, 20)), 0.0, 0.0, False,
    )
    # de-trivialize running stats (fresh init is mean 0 / var 1)
    bs = jax.tree_util.tree_map_with_path(
        lambda p, x: x + 0.3 if "mean" in jax.tree_util.keystr(p)
        else x * 1.7,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    frames = jnp.asarray(
        rng.standard_normal((37, 12)).astype(np.float32)
    )  # 37: not a block multiple
    return model, variables, frames


def _fold(model, variables):
    from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
    from contrastiveprosthetics_tpu.ops.pallas_ops import fold_encoder_params

    class_emb = model.apply(
        variables, method=ContrastiveModel.encode_classes
    )
    return fold_encoder_params(
        variables["params"], variables["batch_stats"], class_emb
    )


def test_folded_chain_matches_flax_inference(inference_model):
    """fold + XLA oracle == encode_emg @ class_embᵀ (the model's own
    inference math, running-average BN)."""
    from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
    from contrastiveprosthetics_tpu.ops.pallas_ops import (
        fused_encoder_logits_reference,
    )

    model, variables, frames = inference_model
    emb = model.apply(
        variables, frames, method=ContrastiveModel.encode_emg
    )
    class_emb = model.apply(
        variables, method=ContrastiveModel.encode_classes
    )
    want = np.asarray(emb @ class_emb.T)
    got = np.asarray(
        fused_encoder_logits_reference(frames, _fold(model, variables))
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_encoder_interpret_matches_reference(inference_model):
    from contrastiveprosthetics_tpu.ops.pallas_ops import (
        fused_encoder_logits,
        fused_encoder_logits_reference,
    )

    model, variables, frames = inference_model
    folded = _fold(model, variables)
    want = np.asarray(fused_encoder_logits_reference(frames, folded))
    got = np.asarray(fused_encoder_logits(frames, folded, True))
    assert got.shape == frames.shape[:1] + (41,)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_encoder_matches_eval_vote_logits(inference_model):
    """The kernel's flat (N, n_classes) logits, reshaped with the clip
    wrapper's vote transpose, must equal the model __call__ eval-vote
    logits (B·W, T, T) — the eval path it would replace."""
    from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
    from contrastiveprosthetics_tpu.ops.pallas_ops import (
        fused_encoder_logits_reference,
    )

    model, variables, frames = inference_model
    rng = np.random.default_rng(5)
    B, T, W = 2, 41, 3
    emg = jnp.asarray(rng.standard_normal((B, T, W, 12)).astype(np.float32))
    glove = jnp.zeros((B, T, 20))
    want = np.asarray(
        model.apply(variables, emg, glove, 0.0, 0.0, False)
    )  # (B·W, T, T)
    flat = fused_encoder_logits_reference(
        emg.reshape(-1, 12), _fold(model, variables)
    )  # (B·T·W, n_classes)
    got = np.asarray(
        flat.reshape(B, T, W, T).transpose(0, 2, 1, 3).reshape(B * W, T, T)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_encoder_full_width_architecture(rng):
    """Reference-width network (7×512): fold handles the real geometry and
    interpret-mode matches flax end to end."""
    from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
    from contrastiveprosthetics_tpu.ops.pallas_ops import (
        fused_encoder_logits,
    )

    model = ContrastiveModel(adabn=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(3)},
        jnp.zeros((1, 41, 12)), jnp.zeros((1, 41, 20)), 0.0, 0.0, False,
    )
    frames = jnp.asarray(rng.standard_normal((8, 12)).astype(np.float32))
    emb = model.apply(
        variables, frames, method=ContrastiveModel.encode_emg
    )
    class_emb = model.apply(
        variables, method=ContrastiveModel.encode_classes
    )
    want = np.asarray(emb @ class_emb.T)
    got = np.asarray(
        fused_encoder_logits(frames, _fold(model, variables), True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_fused_encoder_bf16_fold(inference_model):
    """bf16-folded weights: interpret kernel == XLA oracle on the same
    fold (tight — identical op sequence), and both near the f32 fold
    (loose — bf16 rounding)."""
    from contrastiveprosthetics_tpu.ops.pallas_ops import (
        fold_encoder_params,
        fused_encoder_logits,
        fused_encoder_logits_reference,
    )
    from contrastiveprosthetics_tpu.models.clip import ContrastiveModel

    model, variables, frames = inference_model
    class_emb = model.apply(
        variables, method=ContrastiveModel.encode_classes
    )
    kw = dict(params=variables["params"],
              batch_stats=variables["batch_stats"], class_emb=class_emb)
    f16 = fold_encoder_params(dtype=jnp.bfloat16, **kw)
    assert f16[0].dtype == jnp.bfloat16
    assert f16[1].dtype == jnp.float32  # biases stay f32
    ref16 = np.asarray(fused_encoder_logits_reference(frames, f16))
    got16 = np.asarray(fused_encoder_logits(frames, f16, True))
    np.testing.assert_allclose(got16, ref16, rtol=1e-5, atol=1e-6)
    ref32 = np.asarray(fused_encoder_logits_reference(
        frames, fold_encoder_params(**kw)
    ))
    np.testing.assert_allclose(got16, ref32, rtol=0.1, atol=0.05)


def test_fused_encoder_multiblock_grid(inference_model):
    """N > block size: the sequential grid with constant-index weight
    blocks must match the oracle (covers the pipelined multi-step path
    the eval geometry uses; small N collapses to one block)."""
    from contrastiveprosthetics_tpu.ops.pallas_ops import (
        _ENC_BLOCK_ROWS,
        fused_encoder_logits,
        fused_encoder_logits_reference,
    )

    model, variables, _ = inference_model
    folded = _fold(model, variables)
    n = _ENC_BLOCK_ROWS + 44  # 2 grid steps, padded tail
    frames = jnp.asarray(
        np.random.default_rng(9).standard_normal((n, 12)).astype(np.float32)
    )
    want = np.asarray(fused_encoder_logits_reference(frames, folded))
    got = np.asarray(fused_encoder_logits(frames, folded, True))
    assert got.shape == (n, 41)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n_linear,hidden,d_e", [(1, 64, 8), (3, 128, 16)])
def test_fold_generalizes_across_architectures(rng, n_linear, hidden, d_e):
    """The fold's index arithmetic (BN numbering, head detection, band
    construction) must hold for any (n_linear, hidden, d_e), not just the
    reference geometry."""
    from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
    from contrastiveprosthetics_tpu.ops.pallas_ops import (
        fold_encoder_params,
        fused_encoder_logits_reference,
    )

    model = ContrastiveModel(adabn=False, n_linear=n_linear, hidden=hidden,
                             d_e=d_e)
    variables = model.init(
        {"params": jax.random.PRNGKey(n_linear)},
        jnp.zeros((1, 41, 12)), jnp.zeros((1, 41, 20)), 0.0, 0.0, False,
    )
    frames = jnp.asarray(rng.standard_normal((9, 12)).astype(np.float32))
    emb = model.apply(
        variables, frames, method=ContrastiveModel.encode_emg
    )
    class_emb = model.apply(
        variables, method=ContrastiveModel.encode_classes
    )
    folded = fold_encoder_params(
        variables["params"], variables["batch_stats"], class_emb
    )
    got = np.asarray(fused_encoder_logits_reference(frames, folded))
    np.testing.assert_allclose(
        got, np.asarray(emb @ class_emb.T), rtol=2e-4, atol=2e-5
    )
