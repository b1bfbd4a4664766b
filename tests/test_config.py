"""Golden tests: the frozen config must reproduce the reference's seed-0
canonical orderings and window geometry exactly (reference constants.py)."""
import numpy as np

from contrastiveprosthetics_tpu.config import (
    Config,
    DEFAULT_CONFIG,
    derive_canonical_orderings,
)


def test_canonical_orderings_match_seed0():
    d2, d3, a, b = derive_canonical_orderings()
    cfg = DEFAULT_CONFIG
    np.testing.assert_array_equal(cfg.people_d2(), np.arange(40)[d2])
    remapped = np.array([2, 3, 4, 5, 8, 9]) + 40 - 1
    np.testing.assert_array_equal(cfg.people_d3(), remapped[d3])
    np.testing.assert_array_equal(cfg.tasks(), np.concatenate([a, b]))


def test_people_ordering_values():
    cfg = DEFAULT_CONFIG
    people = cfg.people()
    assert people.shape == (46,)
    # DB3 ids occupy 41..48 range per the reference's +39 remap of {2..9}
    assert set(people[40:]) == {41, 42, 43, 44, 47, 48}
    assert sorted(people[:40]) == list(range(40))


def test_tasks_mask_is_permutation_with_rest_last():
    tm = DEFAULT_CONFIG.tasks_mask()
    assert tm.shape == (41,)
    assert tm[-1] == 0
    assert sorted(tm.tolist()) == list(range(41))


def test_rep_split():
    cfg = DEFAULT_CONFIG
    np.testing.assert_array_equal(cfg.rep_train_idx, [0, 2, 3])
    np.testing.assert_array_equal(cfg.rep_val_idx, [5])
    np.testing.assert_array_equal(cfg.rep_test_idx, [1, 4])
    # db2 train folds the test reps in (load.py:193-195)
    np.testing.assert_array_equal(
        cfg.rep_mask("train", db2=True), [0, 2, 3, 1, 4]
    )
    np.testing.assert_array_equal(cfg.rep_mask("test", db2=True), [5])
    np.testing.assert_array_equal(cfg.rep_mask("test", db2=False), [1, 4])


def test_people_mask_default_is_db3():
    cfg = DEFAULT_CONFIG
    pm = cfg.people_mask()
    np.testing.assert_array_equal(pm, np.array([3, 1, 4, 5, 2, 0]) + 40)
    pm2 = cfg.people_mask(db2=True)
    assert pm2.shape == (40,)
    assert sorted(pm2.tolist()) == list(range(40))


def test_window_geometry():
    cfg = DEFAULT_CONFIG
    assert cfg.factor == 20
    assert cfg.window_edge == 5
    assert cfg.final_window_size == 100
    assert cfg.prediction_window_size == 25
    assert cfg.amt_prediction_windows == 4
    assert cfg.n_voting_cols == 24        # matches voting.npy (48, 24)
    assert cfg.glove_window_size == 25
    assert cfg.ingest_segment_len == 2010
    assert cfg.max_tasks == 41
    assert cfg.max_people == 46


def test_time_mask_fixed_vs_compat():
    fixed = DEFAULT_CONFIG.time_mask()
    assert fixed.shape == (100,)
    assert fixed.max() == 1980 and fixed.min() == 0
    compat = Config(compat_uint8_time_mask=True).time_mask()
    assert compat.shape == (100,)
    # uint8 wraparound: max index is 252 (reference load.py:115 quirk)
    assert compat.max() == 252
