"""Subset-size sweep (reconstructed headline analysis) and artifact export:
format parity with the reference's data/ directory."""
import os
import zipfile
from xml.etree import ElementTree as ET

import jax.numpy as jnp
import numpy as np
import pytest

from contrastiveprosthetics_tpu.eval.subset_sweep import subset_size_sweep
from contrastiveprosthetics_tpu.train.engine import EvalResult
from contrastiveprosthetics_tpu.results.export import export_results
from contrastiveprosthetics_tpu.utils.xlsx import write_xlsx


def _make_logits(rng, n_rows=48 * 25, n_classes=41, sharp=3.0):
    """Synthetic frame-level logits where the true class is favored."""
    logits = rng.standard_normal((n_rows, n_classes, n_classes)).astype(np.float32)
    idx = np.arange(n_classes)
    logits[:, idx, idx] += sharp
    return logits


def test_sweep_shapes_and_monotonicity(rng):
    logits = _make_logits(rng)
    res = subset_size_sweep(logits, trials=32, seed=0)
    assert res.mean.shape == (41,)
    assert res.mean[0] == 0.0                       # placeholder row
    assert res.raw.shape == (40, 32)
    # accuracy decreases (noisily) with set size; compare ends
    assert res.mean[1] > res.mean[40]
    assert (res.min <= res.mean + 1e-7).all() and (res.mean <= res.max + 1e-7).all()


def test_sweep_full_size_matches_frame_accuracy(rng):
    """At size 40 the candidate set is all 41 classes → the sweep accuracy
    equals plain frame-level argmax accuracy (the property used to
    reverse-engineer the semantics; see eval/subset_sweep.py docstring)."""
    logits = _make_logits(rng, sharp=1.0)
    res = subset_size_sweep(logits, trials=8, seed=1)
    flat = logits.reshape(-1, 41)
    true = np.arange(flat.shape[0]) % 41
    frame_acc = (flat.argmax(-1) == true).mean()
    np.testing.assert_allclose(res.mean[40], frame_acc, atol=1e-6)
    # deterministic at full size up to tie-breaks
    assert res.std[40] < 1e-6


def test_sweep_size1_is_binary_vs_rest(rng):
    """Size 1: candidates = {grasp, rest}; accuracy strictly between the
    degenerate 1.0 (no rest candidate) and chance."""
    logits = _make_logits(rng, sharp=0.5)
    res = subset_size_sweep(logits, trials=16, seed=2)
    assert 0.5 < res.mean[1] < 1.0


def _read_xlsx(path):
    z = zipfile.ZipFile(path)
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    rows = []
    for row in root.findall(".//m:row", ns):
        rows.append([float(v.text) for v in row.findall(".//m:v", ns)])
    return rows


def test_xlsx_roundtrip(tmp_path, rng):
    data = rng.standard_normal((5, 3))
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, data)
    got = np.asarray(_read_xlsx(p))
    np.testing.assert_allclose(got, data, rtol=1e-12)


def test_export_results_artifact_set(tmp_path, rng):
    D, W, T = 48, 25, 41
    logits = _make_logits(rng)
    curve = rng.random((D, 24)).astype(np.float32)
    y_true = np.tile(np.arange(T), (D, 1))
    y_pred = rng.integers(0, T, size=(D, T))
    res = EvalResult(
        loss=jnp.float32(1.0),
        accuracy=jnp.float32(0.5),
        curve=jnp.asarray(curve),
        y_pred=jnp.asarray(y_pred),
        y_true=jnp.asarray(y_true),
        logits=jnp.asarray(logits),
    )
    out = str(tmp_path / "res")
    summary = export_results(res, out, sweep_trials=8, plot=True)
    # exact reference artifact set (results.py:42-62 + sweep stage)
    for f in [
        "logs.npy", "y_pred.npy", "y_true.npy", "voting.npy",
        "voting.xlsx", "voting_avg.xlsx", "voting_std.xlsx",
        "confusion_matrix.npy", "confusion_matrix.xlsx",
        "mean_grasp.npy", "mean_grasp.xlsx", "min_grasp.xlsx",
        "max_grasp.xlsx", "std_grasp.xlsx",
    ]:
        assert os.path.exists(os.path.join(out, f)), f
    assert np.load(os.path.join(out, "voting.npy")).shape == (D, 24)
    assert np.load(os.path.join(out, "y_pred.npy")).shape == (D * T,)
    cm = np.load(os.path.join(out, "confusion_matrix.npy"))
    assert cm.shape == (T, T) and cm.sum() == D * T
    assert summary["sweep_mean"].shape == (41,)
