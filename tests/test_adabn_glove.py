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
