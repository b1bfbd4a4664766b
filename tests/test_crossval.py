"""Vmapped crossval sweep: artifact format parity and consistency with
sequential training (train.py:140-198 semantics)."""
import os

import jax
import numpy as np
import pytest

from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG
from contrastiveprosthetics_tpu.data.store import DeviceStore
from contrastiveprosthetics_tpu.data.synthetic import make_processed_dataset
from contrastiveprosthetics_tpu.train.crossval import (
    best_config,
    cross_validate,
    hyper_from_key,
    keys_array,
    load_crossval,
    sample_hyperparams,
)
from contrastiveprosthetics_tpu.train.engine import Hyper, Trainer

CFG = DEFAULT_CONFIG


@pytest.fixture(scope="module")
def trainer():
    emg, pos, glove = make_processed_dataset(
        CFG, people_positions=[40], separability=6.0, seed=3
    )
    store = DeviceStore(CFG, emg, pos, glove)
    # narrow model + batch_size == D (single-batch epochs, no lax.scan):
    # sweep mechanics (vmapping, chunking, artifacts) are architecture- and
    # batch-independent, while XLA:CPU executes any sizeable body INSIDE a
    # while-loop ~20× slower than straight-line (engine._train_epoch note)
    return Trainer(
        CFG, store, adabn=False, batch_size=300, n_linear=2, hidden=64
    )


def test_sampling_distributions():
    h = sample_hyperparams(500, seed=0)
    lr = np.asarray(h.lr_emg)
    assert (lr >= 1e-6).all() and (lr <= 1e-1).all()
    reg = np.asarray(h.reg_glove)
    assert (reg >= 1e-9).all() and (reg <= 1e-1).all()
    dpe = np.asarray(h.dp_emg)
    assert (dpe >= 0.4).all() and (dpe <= 0.6).all()
    dpg = np.asarray(h.dp_glove)
    assert (dpg >= 0.0).all() and (dpg <= 0.9).all()
    # log-uniform: ~half the lr mass below 10^-3.5
    frac = (lr < 10**-3.5).mean()
    assert 0.4 < frac < 0.6


def test_keys_array_roundtrip():
    h = sample_hyperparams(10, seed=1)
    keys = keys_array(h, d_e=16)
    assert keys.shape == (10, 7)
    d_e, h3 = hyper_from_key(keys[3])
    assert d_e == 16
    np.testing.assert_allclose(float(h3.lr_emg), float(np.asarray(h.lr_emg)[3]), rtol=1e-6)


@pytest.mark.slow
def test_crossval_runs_and_saves(trainer, tmp_path):
    h = sample_hyperparams(4, seed=2)
    values = cross_validate(
        trainer, h, epochs=1, key=jax.random.PRNGKey(0),
        save_dir=str(tmp_path), verbose=False,
    )
    assert values.shape == (4, 2)
    assert np.isfinite(values).all()
    v2, k2 = load_crossval(str(tmp_path))
    np.testing.assert_array_equal(v2, values)
    assert k2.shape == (4, 7)
    best = best_config(values, k2)
    assert best.shape == (7,)
    assert best[0] == 16


@pytest.mark.slow
def test_crossval_rbg_key(trainer):
    """The production sweep accepts a typed rbg key (the TPU default via
    --prng_impl auto; bench sweep headline): the impl rides on the key
    through every fold_in/split in-graph — same shapes, hardware-RNG
    streams, finite results."""
    h = sample_hyperparams(4, seed=2)
    values = cross_validate(
        trainer, h, epochs=1, key=jax.random.key(0, impl="rbg"),
        verbose=False,
    )
    assert values.shape == (4, 2)
    assert np.isfinite(values).all()


def test_crossval_default_chunk_is_two_per_dp_shard():
    """The tuned sweep chunk default is 2 configs per dp shard (the
    measured v5e optimum for both RNG impls — crossval.py chunk table);
    pin the exposed constant AND the resolver that cross_validate calls,
    so a semantically equivalent refactor passes but a tuning regression
    doesn't."""
    from contrastiveprosthetics_tpu.train import crossval

    assert crossval.DEFAULT_SWEEP_CHUNK_PER_DP == 2
    assert crossval.resolve_chunk(150, 1) == 2    # go.sh sweep, one chip
    assert crossval.resolve_chunk(150, 8) == 16   # 2 per dp shard
    assert crossval.resolve_chunk(1, 8) == 1      # capped at n configs


@pytest.mark.slow
def test_crossval_chunking_consistent(trainer):
    """Chunked and unchunked sweeps must produce identical values (same
    per-config keys). chunk=4 is explicit: the DEFAULT is now width 2,
    so relying on it would compare chunk=2 against itself."""
    h = sample_hyperparams(4, seed=3)
    v_all = cross_validate(
        trainer, h, epochs=1, key=jax.random.PRNGKey(1), chunk=4,
        verbose=False,
    )
    v_chunks = cross_validate(
        trainer, h, epochs=1, key=jax.random.PRNGKey(1), chunk=2, verbose=False
    )
    # NOTE: key folding depends on chunk starts, so only the first chunk
    # shares RNG streams — and vmap width changes XLA reduction order, so
    # f32 drift over an epoch can flip a borderline eval item. Losses must
    # agree tightly; accuracy within one flipped item.
    assert np.isfinite(v_chunks).all()
    np.testing.assert_allclose(v_all[:2, 0], v_chunks[:2, 0], rtol=1e-3)
    assert np.abs(v_all[:2, 1] - v_chunks[:2, 1]).max() < 0.05


@pytest.mark.slow
def test_sweep_chunk_at_matches_manual_formulation(trainer):
    """engine._sweep_chunk_at derives keys and inits states IN-GRAPH from
    the chunk-start chain; it must equal the manual host-side formulation
    (explicit fold_in/split/init + vmapped _sweep_run) exactly."""
    import jax.numpy as jnp

    n, chunk, ci = 6, 3, 1
    hypers = sample_hyperparams(n, seed=11)
    rows = np.arange(n).reshape(2, chunk)
    h_chunks = Hyper(*[jnp.asarray(np.asarray(x)[rows]) for x in hypers])
    key = jax.random.PRNGKey(5)
    ones = jnp.ones((1,), jnp.float32)

    vl, va = trainer.sweep_chunk_at(
        h_chunks, jnp.int32(ci), key, ones, ones, trainer.batch_size, chunk
    )

    # manual: same chain, host-side
    k_chunk = jax.random.fold_in(key, ci * chunk)
    init_keys = jax.random.split(jax.random.fold_in(k_chunk, 0), chunk)
    states = jax.vmap(trainer.init_state)(init_keys)
    ep_keys = jnp.stack(
        [jax.random.split(jax.random.fold_in(k_chunk, 100), chunk)], axis=1
    )
    val_keys = jax.random.split(jax.random.fold_in(k_chunk, 999), chunk)
    h = Hyper(*[jnp.asarray(np.asarray(x)[rows[ci]]) for x in hypers])
    vl_ref, va_ref = jax.jit(jax.vmap(
        lambda s, ek, vk, hh, tv, vv: trainer._sweep_run(
            s, ek, vk, hh, ones, ones, tv, vv, trainer.batch_size
        ),
        in_axes=(0, 0, 0, 0, None, None),
    ))(states, ep_keys, val_keys, h, trainer.view_train, trainer.view_val)

    np.testing.assert_allclose(
        np.asarray(vl), np.asarray(vl_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(va), np.asarray(va_ref))


def test_cross_validate_rejects_empty_config_set(trainer):
    """n=0 must fail loudly, not with a ZeroDivisionError in the chunker —
    the CLI maps --crossval_size 0 to the canonical hyperparameters
    (cli/train.py) instead of ever reaching here."""
    empty = sample_hyperparams(0, seed=0)
    with pytest.raises(ValueError, match="at least one config"):
        cross_validate(trainer, empty, epochs=1,
                       key=jax.random.PRNGKey(0))
