"""Per-subject AdaBN evaluation and the glove-encoding (zero-shot) config."""
import jax
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
    return Hyper.single(1e-3, 1e-6, 0.5, 1e-3, 1e-6, 0.3)


@pytest.mark.slow
def test_per_subject_adabn_eval(store, hyper):
    trainer = Trainer(CFG, store, adabn=True, batch_size=8)
    res = train_loop(
        trainer, hyper, epochs=1, key=jax.random.PRNGKey(0), verbose=False
    )
    t = trainer.evaluate_per_subject(
        res.state, jax.random.PRNGKey(1), hyper, split="test"
    )
    v = trainer.view_test
    assert t.curve.shape == (v.D, CFG.n_voting_cols)
    assert np.isfinite(float(t.loss))
    assert 0.0 <= float(t.accuracy) <= 1.0
    # per-subject batches must differ from mixed-subject batches under AdaBN
    t_mixed = trainer.evaluate(res.state, jax.random.PRNGKey(1), hyper, split="test")
    assert not np.allclose(np.asarray(t.logits), np.asarray(t_mixed.logits))


def test_per_subject_eval_subject_purity(hyper):
    """Each per-subject batch must contain ONLY that subject's windows:
    corrupting subject 2's data must not change subject 1's outputs (the
    whole point of per-subject AdaBN batch statistics)."""
    emg, pos, glove = make_processed_dataset(
        CFG, people_positions=[40, 41], separability=6.0, seed=3
    )
    s1 = DeviceStore(CFG, emg, pos, glove)
    # the view orders people by the canonical (shuffled) mask — corrupt the
    # store row that lands in view person-block 1
    view_rows = s1._people_rows(db2=False)
    corrupt_row = int(view_rows[1])
    rng = np.random.default_rng(0)
    emg2 = np.array(emg, copy=True)
    emg2[:, corrupt_row] = rng.normal(
        size=emg2[:, corrupt_row].shape
    ).astype(emg2.dtype)
    s2 = DeviceStore(CFG, emg2, pos, glove)
    t1 = Trainer(CFG, s1, adabn=True, batch_size=8)
    t2 = Trainer(CFG, s2, adabn=True, batch_size=8)
    state = t1.init_state(jax.random.PRNGKey(0))
    r1 = t1.evaluate_per_subject(state, jax.random.PRNGKey(1), hyper, split="test")
    r2 = t2.evaluate_per_subject(state, jax.random.PRNGKey(1), hyper, split="test")
    v = t1.view_test
    per = v.D // v.n_people
    W = CFG.prediction_window_size
    # view block 0 (the uncorrupted subject) is bitwise-identical
    np.testing.assert_array_equal(
        np.asarray(r1.curve[:per]), np.asarray(r2.curve[:per])
    )
    np.testing.assert_array_equal(
        np.asarray(r1.logits[: per * W]), np.asarray(r2.logits[: per * W])
    )
    # view block 1 actually changed (the corruption reached the eval)
    assert not np.array_equal(
        np.asarray(r1.logits[per * W:]), np.asarray(r2.logits[per * W:])
    )


def test_per_subject_eval_item_order_deterministic(store, hyper):
    """Per-subject eval uses identity indexing: rows are in true
    (person, rep, group) item order, independent of the PRNG key."""
    trainer = Trainer(CFG, store, adabn=True, batch_size=8)
    state = trainer.init_state(jax.random.PRNGKey(0))
    a = trainer.evaluate_per_subject(state, jax.random.PRNGKey(1), hyper, split="test")
    b = trainer.evaluate_per_subject(state, jax.random.PRNGKey(2), hyper, split="test")
    np.testing.assert_array_equal(np.asarray(a.curve), np.asarray(b.curve))
    np.testing.assert_array_equal(np.asarray(a.y_pred), np.asarray(b.y_pred))


@pytest.mark.slow
def test_glove_encoding_zero_shot_config(store, hyper):
    """BASELINE config 4: glove-angle encodings as class embeddings."""
    trainer = Trainer(
        CFG, store, adabn=False, glove_encoding=True, batch_size=8
    )
    res = train_loop(
        trainer, hyper, epochs=2, key=jax.random.PRNGKey(2),
        annealing=True, verbose=False,
    )
    assert res.train_losses[-1] < res.train_losses[0]
    t = run_test(trainer, res.state, hyper, jax.random.PRNGKey(3))
    assert np.isfinite(float(t.loss))
    # glove prototypes are class-separable in the synthetic corpus → the
    # encoder should learn well above chance
    assert float(t.accuracy) > 3.0 / 41
