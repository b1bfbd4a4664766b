"""bench.py contract-record invariants (VERDICT r3 weak #1 / task 2).

The round-3 driver bench artifact was VOID (rc=124, parsed=null) because
bench.py ran the open-ended serve capacity probes FIRST and printed its
contract JSON only after all five phases. These tests pin the structural
fixes without touching a backend: the contract metric's phase runs first,
and the merged record is derivable from ANY subset of completed phases
(that is what makes the per-phase partial prints parseable).
"""
from __future__ import annotations

import importlib.util
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


def test_train_phase_runs_first():
    """The contract metric (train_windows_per_sec) must be recorded before
    any open-ended phase; serve — whose capacity probes have no fixed
    length — must run last."""
    b = _bench()
    assert b.PHASES[0] == "train"
    assert b.PHASES[-1] == "serve"


def test_contract_record_from_empty_merge():
    """A kill before ANY phase completes must still leave a record with
    the contract keys (value 0, honest)."""
    b = _bench()
    out = b._contract_record({})
    assert out["metric"] == "semg_train_windows_per_sec_per_chip"
    assert out["value"] == 0.0
    assert out["unit"] == "windows/s"
    assert out["vs_baseline"] == 0.0


def test_contract_record_train_only():
    """The record after ONLY the train phase (the first partial print)
    already carries the headline value and its MFU/roofline derivations."""
    b = _bench()
    out = b._contract_record(
        {"train_windows_per_sec": 3.5e6, "device_kind": "TPU v5 lite"}
    )
    assert out["value"] == 3.5e6
    assert out["vs_baseline"] > 100
    assert 0.0 < out["mfu_train"] < 1.0
    assert out["roofline_frac_train"] > 0.0
    # eval/sweep/serve keys absent, not faked
    assert "mfu_eval" not in out
    assert "mfu_sweep" not in out


def test_contract_record_unknown_device():
    """MFU derivation must not crash on an unknown device kind."""
    b = _bench()
    out = b._contract_record(
        {"train_windows_per_sec": 1.0e6, "device_kind": "unknown"}
    )
    assert out["value"] == 1.0e6
