"""Whole-system accuracy differential, reduced geometry (VERDICT r2 #1).

Runs scripts/synth_parity.py as a subprocess: the reference's OWN
train_loop (CPU torch, real Model/TaskWrapper/loopy loss/voting) and this
framework train on byte-identical synthetic split tensors; the harness
exits 0 iff voted accuracy, the voting curve, and the grasp curve agree
within the seed-spread overlap criterion. The full-geometry 3-seed run is
recorded in SYNTH_PARITY.{json,md}; this reduced run (2 subjects, D=600,
single-batch epochs to dodge the XLA:CPU scan pathology) keeps the
machinery continuously verified.
"""
import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
HARNESS = REPO / "scripts" / "synth_parity.py"

pytestmark = pytest.mark.skipif(
    not pathlib.Path("/root/reference/code").is_dir(),
    reason="reference checkout not mounted",
)


@pytest.mark.slow
def test_whole_system_differential_reduced(tmp_path):
    out = tmp_path / "synth_parity.json"
    # calibration (2026-08-19, warm compile cache, 1-core box): ours
    # ~10 min, torch ~80 s; voted accs land ~0.49/0.53 with gaps well
    # inside the binomial-scaled bands (acc 0.041/0.082, curve
    # 0.075/0.087, grasp ≲0.14/0.156 at n_preds=656)
    r = subprocess.run(
        [sys.executable, str(HARNESS),
         "--people", "2", "--epochs", "10", "--seeds", "1",
         "--batch_size", "600", "--trials", "32", "--lr", "1e-2",
         "--separability", "4.0", "--platform", "cpu",
         "--out", str(out)],
        capture_output=True, text=True, timeout=1800,
        cwd=str(REPO),
        env={**os.environ,
             "CPTPU_PLATFORM": "cpu",
             # repo-local cache: a cold compile of the big-batch program
             # costs ~10 extra minutes on this box (CLAUDE.md)
             "JAX_COMPILATION_CACHE_DIR": str(REPO / ".jax_cache_cpu")},
    )
    assert r.returncode == 0, (
        f"harness FAILED\nstdout tail: {r.stdout[-800:]}\n"
        f"stderr tail: {r.stderr[-800:]}"
    )
    summary = json.loads(out.read_text())
    assert summary["ok"] is True
    assert summary["acc_gap"] <= summary["acc_tol"]
    assert summary["curve_gap"] <= summary["curve_tol"]
    assert summary["grasp_gap"] <= summary["grasp_tol"]
    # the run must be non-degenerate: both systems above chance
    assert summary["reference"]["acc_mean"] > 2.0 / 41
    assert summary["ours"]["acc_mean"] > 2.0 / 41
