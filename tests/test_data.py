"""Data layer: ingest round-trip on synthetic .mat fixtures, device store
views (load.py semantics), and the index-math sampler."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastiveprosthetics_tpu.config import Config, DEFAULT_CONFIG
from contrastiveprosthetics_tpu.data.ingest import ingest_emg, ingest_glove
from contrastiveprosthetics_tpu.data.sampler import (
    epoch_batches,
    gather_eval_batch,
    gather_glove_batch,
    gather_train_batch,
    task_permutations,
)
from contrastiveprosthetics_tpu.data.store import DeviceStore
from contrastiveprosthetics_tpu.data.synthetic import (
    make_processed_dataset,
    write_emg_mat_files,
    write_glove_mat_files,
)

CFG = DEFAULT_CONFIG
# two DB2 + two DB3 canonical positions, small but covers both databases
POSITIONS = [0, 1, 40, 41]


@pytest.fixture(scope="module")
def mat_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ninapro"))
    write_emg_mat_files(root, CFG, POSITIONS)
    write_glove_mat_files(root, CFG, people=[28, 29])
    return root


@pytest.fixture(scope="module")
def ingested(mat_root, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("processed"))
    ingest_emg(CFG, mat_root, out, people_positions=POSITIONS, verbose=False)
    ingest_glove(CFG, mat_root, out, people=[28, 29], verbose=False)
    return out


def test_ingest_emg_shapes_and_artifacts(ingested):
    z = np.load(os.path.join(ingested, "emg.npz"))
    assert z["emg"].shape == (4, 41, 6, 100, 12)
    assert z["emg"].dtype == np.float32
    np.testing.assert_array_equal(z["people_positions"], POSITIONS)
    mean = np.load(os.path.join(ingested, "emg_mean.npy"))
    std = np.load(os.path.join(ingested, "emg_std.npy"))
    assert mean.shape == (12,) and std.shape == (12,)
    assert np.all(std > 0)


def test_ingest_complete_quirk(mat_root, tmp_path):
    out = str(tmp_path / "p")
    ingest_emg(
        CFG, mat_root, out, people_positions=[0], complete=True, verbose=False
    )
    # scalar mean + per-channel std, like the shipped artifacts
    assert np.load(os.path.join(out, "emg_mean.npy")).shape == ()
    assert np.load(os.path.join(out, "emg_std.npy")).shape == (12,)


def test_ingest_jax_matches_scipy_backend(mat_root, tmp_path):
    out_j = str(tmp_path / "j")
    out_s = str(tmp_path / "s")
    rj = ingest_emg(CFG, mat_root, out_j, people_positions=[0], backend="jax", verbose=False)
    rs = ingest_emg(CFG, mat_root, out_s, people_positions=[0], backend="scipy", verbose=False)
    np.testing.assert_allclose(rj["emg"], rs["emg"], rtol=5e-3, atol=2e-3)


def test_ingest_glove_shapes(ingested):
    glove = np.load(os.path.join(ingested, "glove.npz"))["glove"]
    # 2 people × 6 reps × 25-frame prefixes = 300 per task
    assert glove.shape == (41, 300, 20)
    mean = np.load(os.path.join(ingested, "glove_mean.npy"))
    assert mean.shape == (20,)


def test_store_views(ingested):
    store = DeviceStore.load(CFG, ingested)
    train = store.view("train")
    # only positions 40, 41 are DB3 (default people_mask)
    assert train.n_people == 2
    assert train.n_reps == 3
    assert train.output_dim == 100
    assert train.D == 2 * 3 * 100
    assert train.emg_flat.shape == (41 * 2 * 3 * 100, 12)
    train.check_indexing()

    val = store.view("val")
    assert val.n_reps == 1 and val.output_dim == 25
    assert val.D == 2 * 1 * 4
    val.check_indexing()

    test = store.view("test")
    assert test.n_reps == 2 and test.D == 2 * 2 * 4
    assert test.emg_groups.shape == (41 * 2 * 2 * 4, 25, 12)
    test.check_indexing()


def test_store_missing_people_raises():
    # a store holding only DB3 rows cannot serve a db2 view
    emg = np.zeros((41, 1, 6, 100, 12), np.float32)
    store = DeviceStore(CFG, emg, people_positions=[40])
    with pytest.raises(ValueError, match="none of the requested"):
        store.view("train", db2=True)


def test_synthetic_processed_dataset_shapes():
    emg, pos, glove = make_processed_dataset(CFG, people_positions=[40, 41, 42])
    assert emg.shape == (41, 3, 6, 100, 12)
    assert glove.shape == (41, 39 * 25, 20)
    store = DeviceStore(CFG, emg, pos, glove)
    v = store.view("train")
    assert v.n_people == 3 and v.D == 3 * 3 * 100


def test_task_permutations():
    key = jax.random.PRNGKey(0)
    tp = np.asarray(task_permutations(key, 41, 100))
    assert tp.shape == (41, 100)
    for t in range(41):
        assert sorted(tp[t].tolist()) == list(range(t * 100, (t + 1) * 100))


def test_epoch_batches_exact_cover():
    key = jax.random.PRNGKey(1)
    b, tail = epoch_batches(key, 1800, 8)
    b = np.asarray(b)
    assert b.shape == (225, 8) and tail.shape == (0,)
    assert sorted(b.ravel().tolist()) == list(range(1800))
    # test-time geometry: bs clamps to D, one batch, nothing dropped
    b2, tail2 = epoch_batches(key, 48, 64)
    assert np.asarray(b2).shape == (1, 48) and tail2.shape == (0,)
    assert sorted(np.asarray(b2).ravel().tolist()) == list(range(48))


def test_epoch_batches_trailing_partial_batch_is_trained():
    """drop_last=False parity (train.py:86): at the CLI default bs=32 over
    D=1800, the 8-item remainder is a real (smaller) final batch — every
    item appears exactly once per epoch, none silently dropped."""
    key = jax.random.PRNGKey(3)
    b, tail = epoch_batches(key, 1800, 32)
    b, tail = np.asarray(b), np.asarray(tail)
    assert b.shape == (56, 32) and tail.shape == (8,)
    covered = sorted(b.ravel().tolist() + tail.tolist())
    assert covered == list(range(1800))


def test_gather_batches_match_reference_semantics():
    """A gathered batch must equal the reference's per-item loop:
    item idx → EMG_use[emg_rand[:, idx]] (utils.py:51-64)."""
    cfg = CFG
    emg, pos, glove = make_processed_dataset(cfg, people_positions=[40, 41])
    store = DeviceStore(cfg, emg, pos, glove)
    v = store.view("train")
    key = jax.random.PRNGKey(2)
    emg_rand = task_permutations(key, v.n_tasks, v.D)
    items = jnp.asarray([0, 5, 17])
    batch = np.asarray(gather_train_batch(v.emg_flat, emg_rand, items))
    assert batch.shape == (3, 41, 12)
    flat = np.asarray(v.emg_flat)
    er = np.asarray(emg_rand)
    for i, idx in enumerate([0, 5, 17]):
        np.testing.assert_array_equal(batch[i], flat[er[:, idx]])

    ev = store.view("test")
    ev_rand = task_permutations(key, ev.n_tasks, ev.D)
    eb = np.asarray(gather_eval_batch(ev.emg_groups, ev_rand, jnp.asarray([1, 2])))
    assert eb.shape == (2, 41, 25, 12)

    g = np.asarray(
        gather_glove_batch(v.glove_flat, task_permutations(key, 41, v.D_glove),
                           jnp.asarray([0, v.D_glove + 3]), v.D_glove)
    )
    assert g.shape == (2, 41, 20)


def test_ingest_handles_short_segments(tmp_path):
    """Recordings shorter than the 2010-sample window must be edge-padded,
    not crash (the reference would fail on its time_mask indexing)."""
    root = str(tmp_path / "mats")
    write_emg_mat_files(root, CFG, [0], samples_per_rep=1500)
    out = str(tmp_path / "out")
    r = ingest_emg(CFG, root, out, people_positions=[0], verbose=False)
    assert r["emg"].shape == (1, 41, 6, 100, 12)
    assert np.isfinite(r["emg"]).all()
