"""Golden checks against the reference's *shipped artifacts* (when mounted).

These validate that our artifact formats and canonical orderings are
byte-layout-compatible with the reference's data/ directory, and that the
properties used to reverse-engineer the absent sweep code actually hold.
Skipped hermetically when the reference checkout isn't present.
"""
import os

import numpy as np
import pytest

REF = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not mounted"
)


def test_reference_artifact_shapes_match_ours():
    assert np.load(f"{REF}/voting.npy").shape == (48, 24)
    assert np.load(f"{REF}/y_pred.npy").shape == (1968,)   # 48 × 41
    assert np.load(f"{REF}/confusion_matrix.npy").shape == (41, 41)
    assert np.load(f"{REF}/cross_val_keys.npy").shape == (150, 7)
    assert np.load(f"{REF}/cross_val_values.npy").shape == (150, 2)


def test_reference_stats_quirk_shapes():
    # scalar mean + per-channel std (the complete-flag quirk we reproduce)
    assert np.load(f"{REF}/emg_mean.npy").shape == ()
    assert np.load(f"{REF}/emg_std.npy").shape == (12,)
    assert np.load(f"{REF}/glove_mean.npy").shape == (20,)
    assert np.load(f"{REF}/glove_std.npy").shape == (20,)


def test_reference_voting_consistency():
    """Shipped voted accuracy chain: y_pred vs y_true == cm diag == last
    voting column (BASELINE.md row 3)."""
    yp = np.load(f"{REF}/y_pred.npy")
    yt = np.load(f"{REF}/y_true.npy")
    v = np.load(f"{REF}/voting.npy")
    cm = np.load(f"{REF}/confusion_matrix.npy")
    acc = (yp == yt).mean()
    np.testing.assert_allclose(acc, v.mean(0)[-1], rtol=1e-9)
    np.testing.assert_allclose(acc, cm.trace() / cm.sum(), rtol=1e-9)


def test_reference_y_true_uses_canonical_task_order():
    """y_true rows must be arange(41) per voting group — our vote_from_logits
    emits exactly this layout."""
    yt = np.load(f"{REF}/y_true.npy").reshape(48, 41)
    np.testing.assert_array_equal(yt, np.tile(np.arange(41), (48, 1)))


def test_our_crossval_keys_format_matches_reference():
    from contrastiveprosthetics_tpu.train.crossval import (
        keys_array,
        sample_hyperparams,
    )

    ref_keys = np.load(f"{REF}/cross_val_keys.npy")
    ours = keys_array(sample_hyperparams(150, seed=0), d_e=16)
    assert ours.shape == ref_keys.shape
    assert ours.dtype == ref_keys.dtype
    # column 0 is d_e=16 in both
    assert (ours[:, 0] == 16).all() and (ref_keys[:, 0] == 16).all()
    # lr/reg columns live in the same log-uniform ranges
    for col in (1, 4):
        assert ref_keys[:, col].min() >= 1e-6 and ref_keys[:, col].max() <= 1e-1
        assert ours[:, col].min() >= 1e-6 and ours[:, col].max() <= 1e-1
