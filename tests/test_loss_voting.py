"""Loss and voting vs literal re-implementations of the reference's loops
(models.py:132-208). Oracles use numpy + the exact per-item iteration the
reference performs in Python."""
import jax
import jax.numpy as jnp
import numpy as np

from contrastiveprosthetics_tpu.eval.voting import confusion_matrix, vote_from_logits
from contrastiveprosthetics_tpu.train.loss import (
    contrastive_train_accuracy,
    prediction_vote_accuracy,
    symmetric_contrastive_loss,
)


def np_softmax_ce(logits, label):
    m = logits.max()
    logp = logits - m - np.log(np.exp(logits - m).sum())
    return -logp[label]


def reference_loopy_loss(logits):
    """models.py:132-173 train branch: per item, CE over T rows, summed,
    /bs; then the transposed direction; averaged (models.py:198-208)."""
    def one_direction(lg):
        bs, T, _ = lg.shape
        total = 0.0
        for item in lg:
            item_loss = np.mean(
                [np_softmax_ce(item[t], t) for t in range(T)]
            )
            total += item_loss
        return total / bs

    return (one_direction(logits) + one_direction(np.transpose(logits, (0, 2, 1)))) / 2


def torch_mode_lowest(arr):
    """torch.mode semantics: most frequent value; ties → smallest value."""
    vals, counts = np.unique(arr, return_counts=True)
    return vals[np.argmax(counts)]  # unique is sorted → first max is smallest


def reference_voting(logits, W=25, n_prefix=24):
    """models.py:138-163 eval branch, literal: per item, per prefix length,
    torch.mode over the prefix of per-frame argmax predictions."""
    B = logits.shape[0] // W
    T = logits.shape[-1]
    lg = logits.reshape(B, W, T, T)
    pred = lg.argmax(-1)  # (B, W, T)
    curves, y_pred = [], []
    for b in range(B):
        row = []
        for k in range(1, n_prefix + 1):
            vote = np.array(
                [torch_mode_lowest(pred[b, :k, t]) for t in range(T)]
            )
            row.append((vote == np.arange(T)).mean())
        curves.append(row)
        y_pred.append(
            np.array([torch_mode_lowest(pred[b, :n_prefix, t]) for t in range(T)])
        )
    return np.array(curves), np.array(y_pred)


def test_symmetric_loss_matches_loopy(rng):
    logits = rng.standard_normal((6, 41, 41)).astype(np.float32)
    got = float(symmetric_contrastive_loss(jnp.asarray(logits)))
    want = reference_loopy_loss(logits.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_symmetric_loss_eval_shape(rng):
    # eval logits (B·W, T, T): reference reshapes to (B, W, T, T) and does
    # CE over W·T rows per item — equal to the global row mean
    logits = rng.standard_normal((2 * 25, 41, 41)).astype(np.float32)
    got = float(symmetric_contrastive_loss(jnp.asarray(logits)))
    want = reference_loopy_loss(logits.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_train_accuracy(rng):
    logits = rng.standard_normal((6, 41, 41)).astype(np.float32)
    got = float(contrastive_train_accuracy(jnp.asarray(logits)))
    want = (logits.argmax(-1) == np.arange(41)).mean()
    np.testing.assert_allclose(got, want)


def test_voting_matches_reference_loop(rng):
    B, W, T = 4, 25, 41
    # low-entropy logits so votes have plenty of ties to exercise tie-break
    logits = rng.integers(0, 3, size=(B * W, T, T)).astype(np.float32)
    res = vote_from_logits(jnp.asarray(logits), window=W, n_prefix=24)
    want_curve, want_pred = reference_voting(logits)
    np.testing.assert_allclose(np.asarray(res.curve), want_curve, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(res.y_pred), want_pred)
    np.testing.assert_array_equal(
        np.asarray(res.y_true), np.tile(np.arange(T), (B, 1))
    )
    np.testing.assert_allclose(
        float(res.accuracy), want_curve[:, -1].mean(), rtol=1e-6
    )


def test_confusion_matrix_matches_sklearn(rng):
    import sklearn.metrics as me

    y_true = np.tile(np.arange(41), 48)
    y_pred = rng.integers(0, 41, size=y_true.shape)
    got = np.asarray(confusion_matrix(jnp.asarray(y_true), jnp.asarray(y_pred), 41))
    want = me.confusion_matrix(y_true, y_pred, labels=np.arange(41))
    np.testing.assert_array_equal(got, want)


def test_prediction_vote_accuracy(rng):
    rows, W, C = 10, 25, 41
    scores = rng.standard_normal((rows, W, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(rows,))
    got = float(prediction_vote_accuracy(jnp.asarray(scores), jnp.asarray(labels)))
    pred = scores.argmax(-1)
    maj = np.array([torch_mode_lowest(pred[i]) for i in range(rows)])
    want = (maj == labels).mean()
    np.testing.assert_allclose(got, want)
