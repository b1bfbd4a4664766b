"""Fused training chain (ops/train_fused.py): exact differentials against
the XLA oracle (values AND custom-VJP gradients), flax-model parity of the
full encoder composition, and engine-level integration.

Interpret-mode notes: the TPU-semantics interpreter stubs the hardware
PRNG to zero bits (all-keep masks — the 1/keep scaling is still
exercised); mask *diversity* through the very same kernel bodies is
covered by ``mask_mode="input"``, and the forward/backward PRNG
regeneration identity is asserted on real hardware by
scripts/tpu_kernel_check.sh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG
from contrastiveprosthetics_tpu.models.emg_net import EMGNet
from contrastiveprosthetics_tpu.ops.train_fused import (
    _keep_threshold,
    _tile_rows,
    dense_chain_reference,
    extract_prng_masks,
    fused_dense_chain,
    fused_emg_embed,
)

CFG = DEFAULT_CONFIG


def _chain_setup(L=4, D0=256, F=128, N=40, seed=0):
    key = jax.random.key(seed)
    ks = jax.random.split(key, 2 * L + 3)
    ws = tuple(
        jax.random.normal(ks[i], (D0 if i == 0 else F, F)) * 0.1
        for i in range(L)
    )
    bs = tuple(jax.random.normal(ks[L + i], (F,)) * 0.1 for i in range(L))
    gs = tuple(jnp.ones((F,)) * (1.0 + 0.1 * i) for i in range(L))
    betas = tuple(jnp.full((F,), 0.05 * i) for i in range(L))
    x0 = jax.random.normal(ks[-3], (N, D0))
    return ws, bs, gs, betas, x0, ks[-2], ks[-1]


def _bernoulli_masks(key, keep, L, N, F):
    mkeys = jax.random.split(key, L)
    return tuple(
        jax.random.bernoulli(mkeys[i], keep, (N, F)).astype(jnp.float32)
        for i in range(L)
    )


def test_chain_matches_oracle_values_and_grads():
    """Input-mask mode, f32, odd N (exercises row padding + valid-row
    masking in the stats/wgrad epilogues): forward and every parameter
    gradient of the custom VJP must match autodiff of the oracle."""
    L, D0, F, N = 4, 256, 128, 40  # dropout_from = 0: every block dropped
    ws, bs, gs, betas, x0, dkey, mkey = _chain_setup(L, D0, F, N)
    rate = jnp.float32(0.25)
    masks = _bernoulli_masks(mkey, 0.75, L, N, F)

    def fused(args):
        h, m, v = fused_dense_chain(
            *args, dkey, rate, mask_mode="input", ext_masks=masks,
            interpret=True,
        )
        return h, m, v

    def ref(args):
        return dense_chain_reference(*args, masks, 1.0 - rate,
                                     dropout_from=0)

    args = (x0, ws, bs, gs, betas)
    hf, mf, vf = jax.jit(fused)(args)
    hr, mr, vr = ref(args)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hr),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mf), np.asarray(mr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vr), atol=1e-5)

    # a loss touching every output row nonlinearly
    gf = jax.jit(jax.grad(lambda a: jnp.sum(jnp.sin(fused(a)[0]))))(args)
    gr = jax.grad(lambda a: jnp.sum(jnp.sin(ref(a)[0])))(args)
    for got, want in zip(jax.tree_util.tree_leaves(gf),
                         jax.tree_util.tree_leaves(gr)):
        scale = max(float(jnp.abs(want).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5 * scale)


def test_chain_stats_cotangents_are_ignored_by_design():
    """The (means, variances) outputs feed only the stop_gradient-ed
    running-average update; differentiating a loss that (wrongly) uses
    them raises no error and the h-path gradients stay correct."""
    L, D0, F, N = 2, 64, 64, 32
    ws, bs, gs, betas, x0, dkey, mkey = _chain_setup(L, D0, F, N)
    masks = _bernoulli_masks(mkey, 0.5, L, N, F)

    def loss(x0):
        h, m, v = fused_dense_chain(
            x0, ws, bs, gs, betas, dkey, jnp.float32(0.5),
            mask_mode="input", ext_masks=masks, interpret=True,
        )
        return jnp.sum(h) + jnp.sum(jax.lax.stop_gradient(m + v))

    g = jax.jit(jax.grad(loss))(x0)
    assert np.all(np.isfinite(np.asarray(g)))


def test_chain_prng_interpret_matches_oracle_with_extracted_masks():
    """prng mode under the TPU interpreter: the in-kernel draws are
    deterministic (stubbed zero bits → all-keep) and the last block's
    XLA-side mask is a real bernoulli; extract_prng_masks must reproduce
    exactly what the chain consumed."""
    L, D0, F, N = 4, 256, 128, 40
    ws, bs, gs, betas, x0, dkey, _ = _chain_setup(L, D0, F, N)
    rate = jnp.float32(0.4)
    hp, mp, vp = jax.jit(lambda *a: fused_dense_chain(
        *a, dkey, rate, mask_mode="prng", interpret=True,
    ))(x0, ws, bs, gs, betas)
    em = extract_prng_masks(N, [F] * L, dkey, rate, n_linear=L,
                            interpret=True)
    hr, mr, vr = dense_chain_reference(x0, ws, bs, gs, betas, em,
                                       1.0 - rate, dropout_from=0)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hr),
                               rtol=2e-5, atol=2e-5)
    # the last mask is a genuine draw: it must not be all-ones
    assert 0.4 < float(em[-1].mean()) < 0.8


def test_chain_bf16_storage_and_gemms():
    """bf16 compute dtype: activations stored bf16, stats f32 — matches
    the oracle at bf16 tolerance."""
    L, D0, F, N = 3, 128, 128, 64
    ws, bs, gs, betas, x0, dkey, mkey = _chain_setup(L, D0, F, N)
    masks = _bernoulli_masks(mkey, 0.75, L, N, F)
    x0 = x0.astype(jnp.bfloat16)
    hf, mf, vf = jax.jit(lambda *a: fused_dense_chain(
        *a, dkey, jnp.float32(0.25), mask_mode="input", ext_masks=masks,
        compute_dtype=jnp.bfloat16, interpret=True,
    ))(x0, ws, bs, gs, betas)
    hr, mr, vr = dense_chain_reference(
        x0, ws, bs, gs, betas, masks, jnp.float32(0.75), dropout_from=0,
        compute_dtype=jnp.bfloat16,
    )
    assert hf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(hf, np.float32), np.asarray(hr, np.float32),
        rtol=0.05, atol=0.05,
    )
    np.testing.assert_allclose(np.asarray(mf), np.asarray(mr),
                               rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("adabn", [True, False])
def test_fused_emg_embed_matches_flax(adabn):
    """Full composition (XLA conv stack + fused chain + head) vs the flax
    EMGNet at rate=0 (mask streams out of play): values, parameter
    gradients, and (plain-BN) the running batch_stats updates."""
    model = EMGNet(d_e=16, adabn=adabn, n_linear=7, hidden=512)
    key = jax.random.key(1)
    frames = jax.random.normal(jax.random.key(2), (82, 12))
    variables = model.init({"params": key, "dropout": key}, frames, 0.0,
                           True)
    params, bstats = variables["params"], variables.get("batch_stats", {})
    dkey = jax.random.key(3)

    def flax_fwd(p):
        out, upd = model.apply(
            {"params": p, "batch_stats": bstats}, frames, 0.0, True,
            rngs={"dropout": dkey}, mutable=["batch_stats"],
        )
        return out, upd["batch_stats"]

    def fused_fwd(p):
        return fused_emg_embed(
            p, frames, jnp.float32(0.0), dkey, batch_stats=bstats,
            adabn=adabn, mask_mode="prng", interpret=True,
        )

    ef, bsf = jax.jit(flax_fwd)(params)
    eg, bsg = jax.jit(fused_fwd)(params)
    np.testing.assert_allclose(np.asarray(ef), np.asarray(eg),
                               rtol=1e-4, atol=1e-5)
    if not adabn:
        for a, b in zip(jax.tree_util.tree_leaves(bsf),
                        jax.tree_util.tree_leaves(bsg)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    gf = jax.jit(jax.grad(lambda p: jnp.sum(jnp.sin(flax_fwd(p)[0]))))(
        params)
    gg = jax.jit(jax.grad(lambda p: jnp.sum(jnp.sin(fused_fwd(p)[0]))))(
        params)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(gf),
        jax.tree_util.tree_leaves(gg),
    ):
        scale = max(float(jnp.abs(a).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4 * scale,
            err_msg=jax.tree_util.keystr(path),
        )


# ---------------------------------------------------------------- engine
@pytest.fixture(scope="module")
def store():
    from contrastiveprosthetics_tpu.data.store import DeviceStore
    from contrastiveprosthetics_tpu.data.synthetic import (
        make_processed_dataset,
    )

    emg, pos, glove = make_processed_dataset(
        CFG, people_positions=[40, 41], separability=6.0, seed=3
    )
    return DeviceStore(CFG, emg, pos, glove)


def test_engine_fused_train_matches_xla_path_at_rate0(store):
    """Trainer(use_fused_train=True) must reproduce the XLA train path
    when the dropout streams are out of play (rate 0 is mask-free in both
    paths): same key → same batches → same per-epoch loss, accuracy, and
    updated parameters/batch_stats to MXU roundoff."""
    from contrastiveprosthetics_tpu.train.engine import Hyper, Trainer

    hyper0 = Hyper.single(
        lr_emg=1e-3, reg_emg=1e-6, dp_emg=0.0,
        lr_glove=1e-3, reg_glove=1e-6, dp_glove=0.0,
    )
    # batch_size=D: single-batch epochs bypass the XLA:CPU scan pathology
    kw = dict(adabn=False, batch_size=store.view("train").D,
              n_linear=2, hidden=64)
    t_ref = Trainer(CFG, store, **kw)
    t_fused = Trainer(CFG, store, use_fused_train=True, **kw)
    assert t_fused.use_fused_train and t_fused._fused_train_eligible
    # two identical states (same init key) — train_epoch donates its
    # input state's buffers, so the ref call would delete a shared one
    state_r = t_ref.init_state(jax.random.PRNGKey(0))
    state_f = t_fused.init_state(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    s_ref, loss_ref, acc_ref = t_ref.train_epoch(state_r, k, hyper0)
    s_fus, loss_fus, acc_fus = t_fused.train_epoch(state_f, k, hyper0)
    np.testing.assert_allclose(float(loss_fus), float(loss_ref), rtol=2e-4)
    np.testing.assert_allclose(float(acc_fus), float(acc_ref), atol=1e-6)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(s_ref.params),
        jax.tree_util.tree_leaves(s_fus.params),
    ):
        scale = max(float(jnp.abs(a).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4 * scale,
            err_msg=jax.tree_util.keystr(path),
        )
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(s_ref.batch_stats),
        jax.tree_util.tree_leaves(s_fus.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow  # two sweep-program compiles + vmapped interpret kernels
def test_sweep_chunk_with_fused_train_matches_xla(store):
    """use_fused_train × the vmapped crossval sweep (VERDICT r3 weak #5):
    the sweep vmaps ``_sweep_run`` — and with the flag on, the fused
    chain's ``pallas_call`` + custom VJP — over the config axis. This
    pins that the composition lowers and reproduces the XLA sweep's
    (val_loss, val_acc) per config at dropout rate 0 (mask streams out
    of play), so enabling the flag with ``--crossval_size`` measures the
    same training, not something silently different."""
    from contrastiveprosthetics_tpu.train.engine import Hyper, Trainer
    from contrastiveprosthetics_tpu.train.schedules import schedule_factors

    kw = dict(adabn=False, batch_size=store.view("train").D,
              n_linear=2, hidden=64)
    t_ref = Trainer(CFG, store, **kw)
    t_fused = Trainer(CFG, store, use_fused_train=True, **kw)
    chunk = 2
    col = lambda a, b: jnp.asarray([[a, b]], jnp.float32)  # (1 chunk, 2)
    h = Hyper(
        lr_emg=col(1e-3, 5e-4), reg_emg=col(1e-6, 1e-5),
        dp_emg=col(0.0, 0.0),
        lr_glove=col(1e-3, 5e-4), reg_glove=col(1e-6, 1e-5),
        dp_glove=col(0.0, 0.0),
    )
    emg_f, glove_f = schedule_factors(
        2, annealing=False, compat_shared_steplr=CFG.compat_shared_steplr
    )
    f_e = jnp.asarray(emg_f, jnp.float32)
    f_g = jnp.asarray(glove_f, jnp.float32)
    key = jax.random.PRNGKey(7)
    vl_r, va_r = t_ref.sweep_chunk_at(
        h, jnp.int32(0), key, f_e, f_g, t_ref.batch_size, chunk
    )
    vl_f, va_f = t_fused.sweep_chunk_at(
        h, jnp.int32(0), key, f_e, f_g, t_fused.batch_size, chunk
    )
    np.testing.assert_allclose(
        np.asarray(vl_f), np.asarray(vl_r), rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(va_f), np.asarray(va_r), atol=1e-6
    )


def test_engine_fused_train_ineligible_warns(store):
    """prediction mode must not engage the fused chain even when asked —
    and must say so at construction (no silent fallback: an A/B would
    record a phantom tie)."""
    from contrastiveprosthetics_tpu.train.engine import Trainer

    with pytest.warns(UserWarning, match="falling back to the XLA"):
        t = Trainer(
            CFG, store, adabn=False, prediction=True, use_fused_train=True,
            batch_size=store.view("train").D, n_linear=2, hidden=64,
        )
    assert not t._fused_train_eligible


def test_keep_threshold_edges():
    thr = jax.jit(_keep_threshold)
    assert int(thr(jnp.float32(1.0))) == 0xFFFFFFFF  # rate 0: keep ALL
    half = int(thr(jnp.float32(0.5)))
    assert abs(half - 2**31) <= 2**9  # ~keep·2³² within f32 rounding
    assert int(thr(jnp.float32(0.0))) == 0


def test_tile_rows_properties():
    for n in (1, 8, 40, 328, 512, 656, 5248, 5000):
        r = _tile_rows(n)
        assert r % 32 == 0 and 32 <= r <= 512
        grid = -(-n // r)
        assert grid * r >= n
    # the canonical geometries tile with minimal waste
    assert _tile_rows(328) == 352 or (-(-328 // _tile_rows(328))) * \
        _tile_rows(328) - 328 <= 32
    r = _tile_rows(5248)
    assert (-(-5248 // r)) * r - 5248 <= 64  # <1.3 % pad at the peak
