"""Models: shapes, AdaBN semantics, parameter census vs the reference
architecture (models.py:230-472)."""
import jax
import jax.numpy as jnp
import numpy as np

from contrastiveprosthetics_tpu.models.clip import ContrastiveModel, l2_penalty

B, T, W, D_E = 4, 41, 25, 16


def _init(model, emg_shape, train=True):
    key = jax.random.PRNGKey(0)
    emg = jnp.zeros(emg_shape)
    glove = jnp.zeros((emg_shape[0], T, 20))
    variables = model.init(
        {"params": key, "dropout": jax.random.PRNGKey(1)},
        emg, glove, 0.5, 0.5, train,
    )
    return variables, emg, glove


def test_train_forward_shapes():
    model = ContrastiveModel(d_e=D_E, adabn=True)
    variables, emg, glove = _init(model, (B, T, 12))
    logits, updates = model.apply(
        variables, emg, glove, 0.5, 0.5, True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert logits.shape == (B, T, T)


def test_eval_vote_forward_shapes():
    model = ContrastiveModel(d_e=D_E, adabn=True)
    variables, _, _ = _init(model, (B, T, 12))
    emg = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, W, 12)), jnp.float32)
    glove = jnp.zeros((B, T, 20))
    logits, _ = model.apply(
        variables, emg, glove, 0.0, 0.0, False, mutable=["batch_stats"]
    )
    assert logits.shape == (B * W, T, T)
    # embeddings are normalized → logits are cosine similarities in [-1, 1]
    assert float(jnp.max(jnp.abs(logits))) <= 1.0 + 1e-5


def test_eval_row_order_is_batch_major_window():
    """Row n of the (B·W, T, T) logits must correspond to (b=n//W, w=n%W) —
    the reference's transpose(1,2)-then-flatten order (models.py:337-341)."""
    model = ContrastiveModel(d_e=D_E, adabn=False)
    variables, _, _ = _init(model, (B, T, 12))
    rng = np.random.default_rng(1)
    emg = jnp.asarray(rng.standard_normal((B, T, W, 12)), jnp.float32)
    glove = jnp.zeros((B, T, 20))
    full, _ = model.apply(variables, emg, glove, 0.0, 0.0, False, mutable=["batch_stats"])
    # single-item forward of item b must equal rows [b·W, (b+1)·W)
    b = 2
    one, _ = model.apply(
        variables, emg[b : b + 1], glove[b : b + 1], 0.0, 0.0, False,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(full[b * W : (b + 1) * W]), np.asarray(one), rtol=2e-2, atol=2e-3
    )


def test_adabn_uses_batch_stats_in_eval():
    """AdaBN: eval output must depend on batch composition (current-batch
    statistics); plain BN eval must not."""
    rng = np.random.default_rng(2)
    emg_a = jnp.asarray(rng.standard_normal((B, T, 12)), jnp.float32)
    emg_b = jnp.concatenate([emg_a[:2], emg_a[2:] * 5.0], axis=0)
    glove = jnp.zeros((B, T, 20))

    model_ada = ContrastiveModel(d_e=D_E, adabn=True)
    va, _, _ = _init(model_ada, (B, T, 12))
    out_a, _ = model_ada.apply(va, emg_a, glove, 0.0, 0.0, False, mutable=["batch_stats"])
    out_b, _ = model_ada.apply(va, emg_b, glove, 0.0, 0.0, False, mutable=["batch_stats"])
    # first two items identical inputs, but batch stats differ → outputs differ
    assert not np.allclose(np.asarray(out_a[:2]), np.asarray(out_b[:2]), atol=1e-5)

    model_pl = ContrastiveModel(d_e=D_E, adabn=False)
    vp, _, _ = _init(model_pl, (B, T, 12))
    out_a2 = model_pl.apply(vp, emg_a, glove, 0.0, 0.0, False)
    out_b2 = model_pl.apply(vp, emg_b, glove, 0.0, 0.0, False)
    np.testing.assert_allclose(
        np.asarray(out_a2[:2]), np.asarray(out_b2[:2]), atol=1e-6
    )


def test_parameter_census_matches_reference():
    """Param counts must match the reference architecture exactly:
    conv 1→64, 64→64 (3×3), 768→512, 6×512→512, 512→16 no-bias EMG head;
    one-hot 41→16 class embed (models.py:248-315,411-414)."""
    model = ContrastiveModel(d_e=16, adabn=True)
    variables, _, _ = _init(model, (B, T, 12))
    params = variables["params"]

    def count(tree):
        return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))

    emg_expected = (
        (1 * 64 * 9 + 64) + (64 * 64 * 9 + 64)      # convs
        + 2 * (64 * 2)                               # conv BNs (scale+bias)
        + (768 * 512 + 512) + 6 * (512 * 512 + 512)  # linear stack
        + 7 * (512 * 2)                              # linear BNs
        + 512 * 16                                   # projection, no bias
    )
    glove_expected = 41 * 16 + 16                    # one-hot embed
    assert count(params["emg_net"]) == emg_expected
    assert count(params["glove_net"]) == glove_expected


def test_l2_penalty_excludes_bn_and_bias():
    model = ContrastiveModel(d_e=16, adabn=True)
    variables, _, _ = _init(model, (B, T, 12))
    params = variables["params"]
    l2 = float(l2_penalty(params["emg_net"]))
    # 10 kernels in the emg net (2 conv + 7 linear + 1 head)
    assert l2 > 0
    # BN scale init = 1 → including BN would add ≥ sqrt(512)·7 ≈ 158
    kernels_only = sum(
        float(jnp.linalg.norm(l.reshape(-1)))
        for p, l in jax.tree_util.tree_leaves_with_path(params["emg_net"])
        if str(p[-1].key) == "kernel"
    )
    np.testing.assert_allclose(l2, kernels_only, rtol=1e-6)


def test_prediction_mode_shapes():
    model = ContrastiveModel(d_e=16, adabn=True, prediction=True)
    variables, emg, glove = _init(model, (B, T, 12))
    scores, _ = model.apply(
        variables, emg, glove, 0.5, 0.5, True,
        rngs={"dropout": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )
    assert scores.shape == (B * T, 41)
    emg_v = jnp.zeros((B, T, W, 12))
    scores_v, _ = model.apply(
        variables, emg_v, glove, 0.0, 0.0, False, mutable=["batch_stats"]
    )
    assert scores_v.shape == (B * T, W, 41)


def test_glove_encoding_mode():
    model = ContrastiveModel(d_e=16, adabn=True, glove_encoding=True)
    variables, emg, glove = _init(model, (B, T, 12))
    logits, _ = model.apply(
        variables, emg, glove, 0.5, 0.5, True,
        rngs={"dropout": jax.random.PRNGKey(4)},
        mutable=["batch_stats"],
    )
    assert logits.shape == (B, T, T)
