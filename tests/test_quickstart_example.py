"""The executable documentation stays executable: examples/quickstart.py
(the runnable form of docs/API.md) must complete end to end — dataset →
train → voted eval → artifacts → parity self-check → checkpoint round trip
→ streaming inference — on CPU with synthetic data."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_quickstart_example_runs_end_to_end(tmp_path):
    env = dict(os.environ,
               CPTPU_PLATFORM="cpu",
               JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache_cpu"))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "quickstart.py"),
         "--out_dir", str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    for line in ("parity self-check: PASS",
                 "checkpoint round trip: identical voted accuracy",
                 "streamed"):
        assert line in out.stdout, out.stdout
    assert (tmp_path / "voting.npy").exists()
    assert (tmp_path / "contrastive.msgpack").exists()
