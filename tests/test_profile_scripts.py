"""Smoke coverage for scripts/profile_serve.py (the serve tick-component
profiler, companion to the ops/pallas_ops.py §2/§3 kernel A/Bs): all four
replay chains — full XLA tick, IIR+RMS-only, encoder-only, fused §3
kernel — must execute on CPU in --quick mode so the script cannot bit-rot
between its real TPU runs (it sat untested through one tunnel outage)."""
from __future__ import annotations

import importlib.util
from pathlib import Path

import pytest


@pytest.mark.slow
def test_profile_serve_quick_runs_all_chains(capsys):
    path = Path(__file__).resolve().parents[1] / "scripts" / "profile_serve.py"
    spec = importlib.util.spec_from_file_location("profile_serve_script", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(["--quick"])  # conftest already pins the CPU backend
    out = capsys.readouterr().out
    for label in (
        "full XLA tick chain",
        "IIR+RMS-only chain",
        "encoder-only chain",
        "fused tick-chain kernel",
        "summary:",
    ):
        assert label in out
