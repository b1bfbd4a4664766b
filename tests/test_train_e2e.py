"""End-to-end: contrastive training on separable synthetic data must learn
(the SURVEY §7 'minimum slice'). Runs on CPU with small geometry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG
from contrastiveprosthetics_tpu.data.store import DeviceStore
from contrastiveprosthetics_tpu.data.synthetic import make_processed_dataset
from contrastiveprosthetics_tpu.train.engine import Hyper, Trainer
from contrastiveprosthetics_tpu.train.loop import run_test, train_loop

CFG = DEFAULT_CONFIG


@pytest.fixture(scope="module")
def store():
    emg, pos, glove = make_processed_dataset(
        CFG, people_positions=[40, 41], separability=6.0, seed=3
    )
    return DeviceStore(CFG, emg, pos, glove)


@pytest.fixture(scope="module")
def hyper():
    return Hyper.single(
        lr_emg=1e-3, reg_emg=1e-6, dp_emg=0.5,
        lr_glove=1e-3, reg_glove=1e-6, dp_glove=0.3,
    )


@pytest.mark.slow
def test_contrastive_learns(store, hyper):
    trainer = Trainer(CFG, store, adabn=False, batch_size=8)
    res = train_loop(
        trainer, hyper, epochs=2, key=jax.random.PRNGKey(0),
        annealing=True, verbose=False,
    )
    assert res.train_losses[-1] < res.train_losses[0]
    assert res.train_accs[-1] > 0.5  # separable classes: way above 1/41

    t = run_test(trainer, res.state, hyper, jax.random.PRNGKey(1))
    assert float(t.accuracy) > 0.5
    assert t.curve.shape == (trainer.view_test.D, CFG.n_voting_cols)
    assert t.y_pred.shape == (trainer.view_test.D, 41)
    assert t.logits.shape == (trainer.view_test.D * 25, 41, 41)
    # voting curve should not degrade with longer windows on easy data
    curve = np.asarray(t.curve).mean(0)
    assert curve[-1] >= curve[0] - 0.05


@pytest.mark.slow
def test_adabn_mode_runs(store, hyper):
    trainer = Trainer(CFG, store, adabn=True, batch_size=8)
    res = train_loop(
        trainer, hyper, epochs=1, key=jax.random.PRNGKey(2), verbose=False
    )
    t = run_test(trainer, res.state, hyper, jax.random.PRNGKey(3))
    assert np.isfinite(float(t.loss))
    assert float(t.accuracy) > 1.0 / 41  # above chance


@pytest.mark.slow
def test_prediction_mode_runs(store, hyper):
    trainer = Trainer(CFG, store, adabn=False, prediction=True, batch_size=8)
    res = train_loop(
        trainer, hyper, epochs=1, key=jax.random.PRNGKey(4), verbose=False
    )
    t = run_test(trainer, res.state, hyper, jax.random.PRNGKey(5))
    assert np.isfinite(float(t.loss))
    assert 0.0 <= float(t.accuracy) <= 1.0


def test_checkpoint_roundtrip(store, hyper, tmp_path):
    from contrastiveprosthetics_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    trainer = Trainer(CFG, store, adabn=False, batch_size=8)
    state = trainer.init_state(jax.random.PRNGKey(6))
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, state)
    template = trainer.init_state(jax.random.PRNGKey(7))
    restored = load_checkpoint(path, template)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_trailing_partial_batch_steps_the_optimizer(store, hyper):
    """drop_last=False parity at the engine level (train.py:86, torch
    default): with a batch size that doesn't divide D, the trailing
    partial batch must take its own (smaller-batch) Adam step instead of
    being silently dropped — every item contributes each epoch."""
    trainer = Trainer(
        CFG, store, adabn=False, batch_size=32, n_linear=2, hidden=64
    )
    D = trainer.view_train.D
    assert D % 32 != 0, "geometry must create a remainder for this test"
    state = trainer.init_state(jax.random.PRNGKey(10))
    state, loss, _ = trainer.train_epoch(state, jax.random.PRNGKey(11), hyper)
    assert int(state.opt_emg.count) == D // 32 + 1
    assert np.isfinite(float(loss))


def test_remat_is_bitwise_identical(store, hyper):
    """Trainer(remat=True) (jax.checkpoint over the loss) must change
    nothing numerically: the same dropout key replays the same masks in
    the recomputed forward, so the post-epoch params match bitwise.
    (Perf: remat LOSES at every measured geometry — engine.py knob note —
    it exists for future wider-model memory pressure.)"""
    out = {}
    for remat in (False, True):
        trainer = Trainer(
            CFG, store, adabn=False, batch_size=store.view("train").D,
            n_linear=2, hidden=64, remat=remat,
        )
        state = trainer.init_state(jax.random.PRNGKey(12))
        state, loss, _ = trainer.train_epoch(
            state, jax.random.PRNGKey(13), hyper
        )
        out[remat] = (state, float(loss))
    assert out[False][1] == out[True][1]
    for x, y in zip(
        jax.tree_util.tree_leaves(out[False][0].params),
        jax.tree_util.tree_leaves(out[True][0].params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_train_epoch_is_deterministic(store, hyper):
    trainer = Trainer(CFG, store, adabn=False, batch_size=8)
    s0 = trainer.init_state(jax.random.PRNGKey(8))
    s1 = trainer.init_state(jax.random.PRNGKey(8))
    key = jax.random.PRNGKey(9)
    # donation invalidates inputs; run two fresh states through same key
    s0b, l0, _ = trainer.train_epoch(s0, key, hyper)
    s1b, l1, _ = trainer.train_epoch(s1, key, hyper)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for x, y in zip(
        jax.tree_util.tree_leaves(s0b.params), jax.tree_util.tree_leaves(s1b.params)
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_prediction_glove_mode_runs(store, hyper):
    """--prediction --glove: classify from glove angles (the reference's
    head is dimensionally broken, models.py:416-428; ours works)."""
    trainer = Trainer(
        CFG, store, adabn=False, prediction=True, glove=True, batch_size=8
    )
    res = train_loop(
        trainer, hyper, epochs=1, key=jax.random.PRNGKey(10), verbose=False
    )
    t = run_test(trainer, res.state, hyper, jax.random.PRNGKey(11))
    assert np.isfinite(float(t.loss))
    # the synthetic glove corpus is class-separable → should learn strongly
    assert float(t.accuracy) > 0.2


@pytest.mark.slow
def test_db2_view_training(hyper):
    """BASELINE config 1 geometry: DB2 subjects, train folds test reps in
    (load.py:193-195), test uses the val rep."""
    emg, pos, glove = make_processed_dataset(
        CFG, people_positions=[0, 1], separability=6.0, seed=5
    )
    store = DeviceStore(CFG, emg, pos, glove)
    trainer = Trainer(CFG, store, db2=True, adabn=False, batch_size=8)
    assert trainer.view_train.n_reps == 5    # 3 train + 2 test reps folded in
    assert trainer.view_test.n_reps == 1     # db2 test = val rep
    res = train_loop(
        trainer, hyper, epochs=1, key=jax.random.PRNGKey(20), verbose=False
    )
    t = run_test(trainer, res.state, hyper, jax.random.PRNGKey(21))
    assert np.isfinite(float(t.loss))
    assert float(t.accuracy) > 0.3


def test_eval_item_order_invariant_to_batching(store, hyper):
    """Eval artifacts are un-shuffled back to item order, so two evals with
    the same sampler key but different batch sizes must produce identical
    per-item rows (plain BN: no batch-composition effects)."""
    trainer = Trainer(CFG, store, adabn=False, batch_size=8)
    state = trainer.init_state(jax.random.PRNGKey(30))
    key = jax.random.PRNGKey(31)
    D = trainer.view_test.D
    a = trainer.evaluate(state, key, hyper, split="test", batch_size=4)
    b = trainer.evaluate(state, key, hyper, split="test", batch_size=16)
    # non-dividing batch size: trailing partial batch is padded, every item
    # still evaluated exactly once and un-shuffled to the right row
    bs_ragged = 20
    assert D % bs_ragged != 0
    c = trainer.evaluate(state, key, hyper, split="test", batch_size=bs_ragged)
    for other in (b, c):
        np.testing.assert_allclose(
            np.asarray(a.curve), np.asarray(other.curve), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(a.y_pred), np.asarray(other.y_pred)
        )
        np.testing.assert_allclose(
            np.asarray(a.logits), np.asarray(other.logits), atol=1e-5
        )
        # loss weights pad duplicates out → exact per-item mean at any bs
        np.testing.assert_allclose(
            float(a.loss), float(other.loss), rtol=1e-5
        )


def test_orbax_checkpoint_roundtrip(store, hyper, tmp_path):
    from contrastiveprosthetics_tpu.train.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    trainer = Trainer(CFG, store, adabn=False, batch_size=8)
    state = trainer.init_state(jax.random.PRNGKey(40))
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(path, state)
    template = trainer.init_state(jax.random.PRNGKey(41))
    restored = load_checkpoint_orbax(path, template)
    for x, y in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_multi_epoch_scan_matches_sequential_epochs(store, hyper):
    """engine.train_epochs (one lax.scan-over-epochs dispatch, the
    train_loop verbose=False path) must equal the same epochs dispatched
    one by one with identical keys/factors."""
    # small model + small batches: XLA:CPU executes sizeable loop bodies
    # ~20× slower than straight-line code (see engine._train_epoch), so keep
    # per-step rows small; equivalence is architecture-independent
    trainer = Trainer(
        CFG, store, adabn=False, batch_size=8, n_linear=2, hidden=64
    )
    key = jax.random.PRNGKey(7)
    factors = np.array([1.0, 0.5], np.float32)
    keys = jax.random.split(key, 2)

    s0 = trainer.init_state(jax.random.PRNGKey(8))
    s_scan, losses, accs = trainer.train_epochs(s0, keys, hyper, factors, factors)

    s_seq = trainer.init_state(jax.random.PRNGKey(8))
    seq_losses = []
    for i in range(2):
        s_seq, loss, acc = trainer.train_epoch(
            s_seq, keys[i], hyper, float(factors[i]), float(factors[i])
        )
        seq_losses.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(seq_losses), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_scan.params),
        jax.tree_util.tree_leaves(s_seq.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


@pytest.mark.slow
def test_train_loop_rng_invariant_to_verbose_flag(store, hyper, capsys):
    """The same seed must train the same weights whether train_loop takes
    the fused single-dispatch path (verbose=False) or the per-epoch host
    loop (verbose=True) — the key chains are derived identically."""
    from contrastiveprosthetics_tpu.train.loop import train_loop

    trainer = Trainer(
        CFG, store, adabn=False, batch_size=8, n_linear=2, hidden=64
    )
    r_quiet = train_loop(
        trainer, hyper, epochs=2, key=jax.random.PRNGKey(21),
        annealing=True, verbose=False,
    )
    r_loud = train_loop(
        trainer, hyper, epochs=2, key=jax.random.PRNGKey(21),
        annealing=True, verbose=True,
    )
    capsys.readouterr()
    np.testing.assert_allclose(
        np.asarray(r_quiet.train_losses), np.asarray(r_loud.train_losses),
        rtol=1e-6,
    )
    np.testing.assert_allclose(r_quiet.val_loss, r_loud.val_loss, rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(r_quiet.state.params),
        jax.tree_util.tree_leaves(r_loud.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("compat", [False, True])
@pytest.mark.slow
def test_checkpoint_rule_quirk(store, hyper, tmp_path, monkeypatch, compat):
    """Quirk ledger row 5 (config.py): default checkpoints on val-loss
    *improvement* (<= min); compat_checkpoint_on_max reproduces the
    reference's ``loss_val <= max(val_losses)`` rule (train.py:122-126)
    which re-saves on nearly every epoch."""
    import dataclasses as _dc

    from contrastiveprosthetics_tpu.train import loop as loop_mod
    from contrastiveprosthetics_tpu.train.engine import EvalResult

    cfg = _dc.replace(CFG, compat_checkpoint_on_max=compat)
    trainer = Trainer(cfg, store, adabn=False, batch_size=8,
                      n_linear=2, hidden=64)

    scripted = iter([1.0, 2.0, 0.5])

    def fake_evaluate(state, key, h, split="val", batch_size=None):
        v = next(scripted)
        z = jnp.zeros(())
        return EvalResult(loss=jnp.float32(v), accuracy=z, curve=z,
                          y_pred=z, y_true=z, logits=z)

    saves = []
    monkeypatch.setattr(trainer, "evaluate", fake_evaluate)
    monkeypatch.setattr(loop_mod, "save_checkpoint",
                        lambda path, state: saves.append(path))

    loop_mod.train_loop(
        trainer, hyper, epochs=3, key=jax.random.PRNGKey(50),
        checkpoint=True, checkpoint_path=str(tmp_path / "c.msgpack"),
        verbose=False,
    )
    # losses 1.0, 2.0, 0.5 → min rule saves at epochs 0 and 2;
    # the reference's max rule additionally re-saves the worse epoch 1
    assert len(saves) == (3 if compat else 2)


@pytest.mark.slow
def test_bf16_mixed_precision_trains(store, hyper):
    """--bf16 path: encoder GEMMs in bfloat16 while params/opt state stay
    float32 (mixed precision), training still learns, and outputs are f32."""
    trainer = Trainer(
        CFG, store, adabn=False, batch_size=100, n_linear=2, hidden=64,
        compute_dtype="bfloat16",
    )
    state = trainer.init_state(jax.random.PRNGKey(30))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32  # master weights stay f32
    losses = []
    for e in range(3):
        state, loss, acc = trainer.train_epoch(
            state, jax.random.fold_in(jax.random.PRNGKey(31), e), hyper
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # separable data: must learn in bf16 too
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    res = trainer.evaluate(state, jax.random.PRNGKey(32), hyper, split="val")
    assert res.logits.dtype == jnp.float32
    assert np.isfinite(float(res.loss))


def test_committed_store_single_lowering(hyper):
    """With a device-committed store, fresh-state and returned-state calls
    must share ONE lowering of the epoch program.

    The views are committed jit arguments, so program outputs come back
    committed; if ``init_state`` returned uncommitted arrays the second
    call would present a different argument-sharding signature and trigger
    a full second XLA compilation (measured 13.5 s for the 5-epoch program
    on v5e)."""
    emg, pos, glove = make_processed_dataset(
        CFG, people_positions=[40, 41], separability=6.0, seed=5
    )
    dev = jax.devices()[0]
    store = DeviceStore(CFG, emg, pos, glove, device=dev)
    trainer = Trainer(
        CFG, store, adabn=False, batch_size=store.view("train").D,
        n_linear=2, hidden=64,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    # committed exactly like the program's own outputs
    assert all(
        leaf.committed for leaf in jax.tree_util.tree_leaves(state)
    ), "init_state must commit the state when the store is committed"
    n = 1  # single epoch: the scan-free branch (XLA:CPU scan pathology)
    ones = np.ones(n, np.float32)
    for i in range(2):  # fresh state, then the returned (committed) state
        state, losses, _ = trainer.train_epochs(
            state, jax.random.split(jax.random.PRNGKey(i), n), hyper,
            ones, ones,
        )
    jax.block_until_ready(losses)
    assert trainer._train_epochs_jit._cache_size() == 1


def test_fused_encoder_eval_matches_xla_path(store, hyper):
    """use_fused_encoder=True (interpret mode on CPU) must reproduce the
    XLA eval path bit-for-bit in structure and numerically in values: same
    key → same permutations/batches, so loss/logits/votes line up."""
    kwargs = dict(adabn=False, batch_size=8, n_linear=2, hidden=64)
    t_ref = Trainer(CFG, store, **kwargs)
    t_fused = Trainer(CFG, store, use_fused_encoder=True, **kwargs)
    assert t_fused._fused_encoder_eligible
    state = t_ref.init_state(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(2)
    r_ref = t_ref.evaluate(state, k, hyper, split="test")
    r_fused = t_fused.evaluate(state, k, hyper, split="test")
    np.testing.assert_allclose(
        np.asarray(r_fused.logits), np.asarray(r_ref.logits),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        float(r_fused.loss), float(r_ref.loss), rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(r_fused.y_pred), np.asarray(r_ref.y_pred)
    )
    np.testing.assert_allclose(
        np.asarray(r_fused.curve), np.asarray(r_ref.curve), atol=1e-6
    )


def test_fused_encoder_ineligible_configs_fall_back(store, hyper):
    """AdaBN / prediction / glove_encoding trainers must not engage the
    fused path even when asked — and must say so (a silent fallback would
    let an A/B record a phantom tie)."""
    for kw in (dict(adabn=True), dict(adabn=False, prediction=True),
               dict(adabn=False, glove_encoding=True)):
        t = Trainer(CFG, store, batch_size=8, n_linear=2, hidden=64,
                    use_fused_encoder=True, **kw)
        assert not t._fused_encoder_eligible
        state = t.init_state(jax.random.PRNGKey(0))
        with pytest.warns(UserWarning, match="falling back to the XLA"):
            res = t.evaluate(state, jax.random.PRNGKey(2), hyper,
                             split="val")
        assert np.isfinite(float(res.loss))
