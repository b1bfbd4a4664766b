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


# ---- compact contract line (VERDICT r4 task 1) -------------------------
# BENCH_r04.json died with rc=0/parsed=null: the driver keeps only the
# last 2,000 characters of stdout and the full contract line had grown to
# ~4-5 KB, truncating the head (metric/value/train fields) out of the
# capture. These tests pin the defense: the LAST stdout line is always a
# standalone-parseable compact JSON object under COMPACT_MAX_BYTES.

def _realistic_full_record(b):
    """The heaviest record we have ever produced: the round-4 self-bench
    (the very record whose driver capture was voided), with round-5 fields
    (eval_attempts, partial markers) piled on top."""
    import json

    full = json.loads((REPO / "BENCH_SELF_r04.json").read_text())
    full["eval_attempts"] = [
        {"wps": 7014214.8, "regime": "degraded", "rtt_ms": 29.38},
        {"wps": 13500000.0, "regime": "degraded", "rtt_ms": 31.02},
        {"wps": 22300000.0, "regime": "fast", "rtt_ms": 27.11},
    ]
    out = b._contract_record(full)
    out["partial"] = True
    out["phases_done"] = ["train", "train_peak", "sweep", "eval"]
    return out


def test_compact_record_fits_capture_window():
    """The compact line serialized from the heaviest real record must be
    one standalone JSON object < COMPACT_MAX_BYTES (1500) — so a 2,000-char
    tail capture always contains it whole."""
    import json

    b = _bench()
    c = b._compact_record(_realistic_full_record(b))
    line = json.dumps(c)
    assert len(line.encode()) < b.COMPACT_MAX_BYTES
    back = json.loads(line)  # standalone parseable
    # the contract essentials the round-4 capture lost
    assert back["metric"] == "semg_train_windows_per_sec_per_chip"
    assert back["value"] == back["train_windows_per_sec"] > 0
    assert back["unit"] == "windows/s"
    assert back["vs_baseline"] > 0
    for k in ("train_peak_windows_per_sec", "mfu_train", "mfu_train_peak",
              "mfu_sweep", "eval_windows_per_sec", "eval_dispatch_regime",
              "eval_attempts", "serve_capacity_sessions",
              "serve_capacity_tick_ms", "partial", "phases_done"):
        assert k in back, k


def test_compact_record_preserves_and_truncates_errors():
    b = _bench()
    c = b._compact_record({"metric": "m", "value": 0.0, "unit": "u",
                           "vs_baseline": 0.0, "eval_error": "x" * 5000})
    assert c["eval_error"] == "x" * 160


def test_compact_record_drops_to_fit_pathological_values():
    """Even with absurdly bloated optional values the line stays under the
    cap — non-core keys drop from the end, core keys never."""
    import json

    b = _bench()
    full = {"metric": "semg_train_windows_per_sec_per_chip", "value": 1.0,
            "unit": "windows/s", "vs_baseline": 1.0,
            "eval_attempts": [{"wps": 1.0, "regime": "x" * 900}] * 5,
            "skipped_for_budget": ["y" * 900]}
    c = b._compact_record(full)
    assert len(json.dumps(c).encode()) <= b.COMPACT_MAX_BYTES
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in c


def test_emit_record_last_line_is_compact(capsys):
    """_emit_record prints full-then-compact: the final stdout line of any
    emit (partial or final) parses standalone and fits the window."""
    import json

    b = _bench()
    b._emit_record({"train_windows_per_sec": 3.5e6,
                    "device_kind": "TPU v5 lite"},
                   phases_done=["train"])
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    last = json.loads(lines[-1])
    assert len(lines[-1].encode()) < b.COMPACT_MAX_BYTES
    assert last["value"] == 3.5e6 and last["partial"] is True
    # the full record precedes it, intact
    assert json.loads(lines[0])["roofline_frac_train"] > 0


def test_every_wps_key_has_stat_sibling():
    """VERDICT r4 task 6: every *_windows_per_sec in the merged record
    carries a sibling *_headline_stat naming its estimator (backfilled by
    _contract_record if a phase forgot)."""
    b = _bench()
    out = b._contract_record({
        "train_windows_per_sec": 3.5e6,
        "train_peak_windows_per_sec": 6.8e6,
        "crossval_sweep_windows_per_sec": 4.0e6,
        "eval_windows_per_sec": 2.2e7,
        "eval_peak_windows_per_sec": 6.3e6,
        "device_kind": "TPU v5 lite",
    })
    for k in list(out):
        if k.endswith("_windows_per_sec") and out[k]:
            sib = k[: -len("_windows_per_sec")] + "_headline_stat"
            assert out.get(sib) and out[sib] != "UNSPECIFIED", sib


def test_phase_supplied_stat_not_overwritten():
    b = _bench()
    out = b._contract_record({"eval_windows_per_sec": 1.0e7,
                              "eval_headline_stat": "median of 4x200",
                              "device_kind": "unknown"})
    assert out["eval_headline_stat"] == "median of 4x200"


# ---- eval regime retry (VERDICT r4 task 2) -----------------------------

def test_eval_retry_until_fast(monkeypatch):
    """A degraded first draw triggers fresh-subprocess retries; the fast
    attempt becomes the headline and every attempt is recorded."""
    b = _bench()
    draws = [{"eval_windows_per_sec": 1.3e7, "eval_dispatch_regime":
              "degraded", "eval_rtt_null_p50_ms": 31.0},
             {"eval_windows_per_sec": 2.2e7, "eval_dispatch_regime":
              "fast", "eval_rtt_null_p50_ms": 27.0}]
    monkeypatch.setattr(b, "_run_phase_subprocess",
                        lambda phase, **kw: draws.pop(0))
    first = {"eval_windows_per_sec": 7.0e6,
             "eval_dispatch_regime": "degraded",
             "eval_rtt_null_p50_ms": 29.4,
             "eval_encoder_ab": {"xla": 7.0e6, "fused": 6.8e6}}
    out = b._eval_with_retry(first, t_start=__import__("time").monotonic(),
                             budget_s=1e9)
    assert out["eval_windows_per_sec"] == 2.2e7
    assert out["eval_dispatch_regime"] == "fast"
    assert [a["regime"] for a in out["eval_attempts"]] == [
        "degraded", "degraded", "fast"]
    # headline-only retries: the first attempt's A/B grid must survive
    # the overlay, labeled with where it was measured
    assert out["eval_encoder_ab"] == {"xla": 7.0e6, "fused": 6.8e6}
    assert out["eval_ab_measured_at_attempt"] == 1


def test_eval_retry_three_degraded_picks_best(monkeypatch):
    """If no fast draw appears in 3 attempts, the best degraded reading
    headlines — the record shows the policy ran out, not that it never
    existed."""
    b = _bench()
    draws = [{"eval_windows_per_sec": 1.4e7,
              "eval_dispatch_regime": "degraded"},
             {"eval_windows_per_sec": 1.1e7,
              "eval_dispatch_regime": "degraded"}]
    monkeypatch.setattr(b, "_run_phase_subprocess",
                        lambda phase, **kw: draws.pop(0))
    out = b._eval_with_retry({"eval_windows_per_sec": 7.0e6,
                              "eval_dispatch_regime": "degraded"},
                             t_start=__import__("time").monotonic(),
                             budget_s=1e9)
    assert out["eval_windows_per_sec"] == 1.4e7
    assert len(out["eval_attempts"]) == 3
    assert not draws  # both retries consumed


def test_eval_no_retry_when_fast(monkeypatch):
    b = _bench()
    monkeypatch.setattr(
        b, "_run_phase_subprocess",
        lambda phase, **kw: (_ for _ in ()).throw(AssertionError("retried")))
    first = {"eval_windows_per_sec": 2.2e7, "eval_dispatch_regime": "fast"}
    out = b._eval_with_retry(first, t_start=0.0, budget_s=1e9)
    assert out == first  # untouched, no eval_attempts noise


def test_eval_retry_respects_budget(monkeypatch):
    """No retry when the remaining budget can't cover a headline-only
    retry plus the still-unrun serve phase (reserve-aware gate)."""
    import time as _t

    b = _bench()
    monkeypatch.setattr(
        b, "_run_phase_subprocess",
        lambda phase, **kw: (_ for _ in ()).throw(AssertionError("retried")))
    first = {"eval_windows_per_sec": 7.0e6,
             "eval_dispatch_regime": "degraded"}
    out = b._eval_with_retry(first, t_start=_t.monotonic() - 1000.0,
                             budget_s=1000.0)
    assert out["eval_windows_per_sec"] == 7.0e6
    assert "eval_attempts" not in out
