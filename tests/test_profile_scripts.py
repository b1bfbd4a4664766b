"""Smoke coverage for scripts/profile_serve.py (the serve tick-component
profiler, companion to the ops/pallas_ops.py §2/§3 kernel A/Bs): all four
replay chains — full XLA tick, IIR+RMS-only, encoder-only, fused §3
kernel — must execute on CPU in --quick mode so the script cannot bit-rot
between its real TPU runs (it sat untested through one tunnel outage)."""
from __future__ import annotations

import importlib.util
from pathlib import Path

import pytest


def _load(name):
    path = Path(__file__).resolve().parents[1] / "scripts" / f"{name}.py"
    spec = importlib.util.spec_from_file_location(f"{name}_script", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_profile_serve_quick_runs_all_chains(capsys):
    _load("profile_serve").main(["--quick"])  # conftest pins CPU backend
    out = capsys.readouterr().out
    for label in (
        "full XLA tick chain",
        "IIR+RMS-only chain",
        "encoder-only chain",
        "fused tick-chain kernel",
        "summary:",
    ):
        assert label in out


@pytest.mark.slow
def test_trace_train_quick_attributes_ops(capsys):
    _load("trace_train").main(["--quick"])
    out = capsys.readouterr().out
    assert "untraced wall:" in out
    assert "total attributed device time:" in out
