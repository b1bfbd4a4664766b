"""cptpu-parity — the one-command artifact diff (round-2 VERDICT task 5).

Hermetic: a synthetic artifact set is diffed against itself (PASS, exit 0)
and against a perturbed copy (FAIL, exit 1). The real-data invocation the
tool exists for — ``cptpu-parity out/ --ref /root/reference/data`` — runs
the same code path.
"""
import os
import shutil

import numpy as np
import pytest

from contrastiveprosthetics_tpu.cli.parity import main
from contrastiveprosthetics_tpu.utils.xlsx import write_xlsx


@pytest.fixture()
def artifact_dir(tmp_path):
    """A minimal, internally consistent artifact set in the reference
    layout (results.py:42-62 + sweep xlsx)."""
    d = tmp_path / "run"
    d.mkdir()
    rng = np.random.default_rng(0)
    groups, classes = 48, 41
    y_true = np.tile(np.arange(classes), groups)
    y_pred = y_true.copy()
    wrong = rng.choice(y_true.size, size=int(y_true.size * 0.66), replace=False)
    y_pred[wrong] = rng.integers(0, classes, size=wrong.size)
    np.save(d / "y_true.npy", y_true)
    np.save(d / "y_pred.npy", y_pred)
    acc = (y_pred == y_true).mean()
    voting = rng.uniform(acc - 0.02, acc + 0.02, size=(groups, 24))
    voting[:, -1] = (y_pred == y_true).reshape(groups, classes).mean(1)
    np.save(d / "voting.npy", voting)
    cm = np.zeros((classes, classes), dtype=np.int64)
    np.add.at(cm, (y_true, y_pred), 1)
    np.save(d / "confusion_matrix.npy", cm)
    curve = np.concatenate([[0.0], np.linspace(0.8, acc, classes - 1)])
    for stem in ("mean_grasp", "min_grasp", "max_grasp"):
        write_xlsx(str(d / f"{stem}.xlsx"), curve)
    write_xlsx(str(d / "std_grasp.xlsx"), np.full(classes, 0.02))
    return str(d)


def test_parity_self_diff_passes(artifact_dir, capsys):
    assert main([artifact_dir, "--ref", artifact_dir]) == 0
    out = capsys.readouterr().out
    assert "PASS: 13/13" in out


def test_parity_perturbed_copy_fails(artifact_dir, tmp_path, capsys):
    bad = str(tmp_path / "bad")
    shutil.copytree(artifact_dir, bad)
    yp = np.load(os.path.join(bad, "y_pred.npy"))
    rng = np.random.default_rng(1)
    flip = rng.choice(yp.size, size=yp.size // 2, replace=False)
    yp[flip] = (yp[flip] + 7) % 41
    np.save(os.path.join(bad, "y_pred.npy"), yp)
    assert main([bad, "--ref", artifact_dir]) == 1
    out = capsys.readouterr().out
    assert "FAIL" in out
    # y_true untouched → exact check still passes; accuracy check fails
    assert "y_true exact" in out


def test_parity_missing_artifact_fails(artifact_dir, tmp_path, capsys):
    incomplete = str(tmp_path / "incomplete")
    shutil.copytree(artifact_dir, incomplete)
    os.unlink(os.path.join(incomplete, "voting.npy"))
    assert main([incomplete, "--ref", artifact_dir]) == 1
    assert "MISSING" in capsys.readouterr().out


def test_parity_shape_mismatch_fails(artifact_dir, tmp_path, capsys):
    other = str(tmp_path / "other")
    shutil.copytree(artifact_dir, other)
    np.save(os.path.join(other, "voting.npy"),
            np.zeros((48, 249)))  # the models.py:153 bound, not the artifact
    assert main([other, "--ref", artifact_dir]) == 1
    assert "voting shape" in capsys.readouterr().out


def test_parity_tolerance_flags_are_respected(artifact_dir, tmp_path):
    near = str(tmp_path / "near")
    shutil.copytree(artifact_dir, near)
    v = np.load(os.path.join(near, "voting.npy"))
    np.save(os.path.join(near, "voting.npy"), v + 0.03)  # inside 0.05
    assert main([near, "--ref", artifact_dir]) == 0
    assert main([near, "--ref", artifact_dir, "--tol_curve", "0.01"]) == 1


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/data"),
    reason="reference artifacts not mounted",
)
def test_parity_reference_self_consistency():
    """The reference's own shipped artifacts must pass against themselves —
    the invocation shape PARITY_RUN.md ends in, runnable today."""
    assert main(["/root/reference/data", "--ref", "/root/reference/data"]) == 0
