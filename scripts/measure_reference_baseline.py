"""Measure the ACTUAL reference implementation's training throughput on CPU.

VERDICT r1 §next-8: the reference publishes no throughput numbers, so
bench.py's ``vs_baseline`` denominator was a documented *estimate* of its
GPU ceiling (~7,380 windows/s). This script firms that up with a measured
number: it imports the reference's own ``Model`` (models.py:66-228), builds
the exact ``train_loop`` body (train.py:86-108 — forward, ``Model.loss``
with its per-item Python CE loop models.py:146-147, ``+ model.l2()``,
backward, two Adam steps) over a DataLoader yielding TaskWrapper-shaped
batches (utils.py:51-64: EMG (TASKS,1,1,12), GLOVE (TASKS,20), label
arange(TASKS)), and times it on CPU torch (the only torch backend in this
image; clearly labeled as CPU).

Writes BASELINE_MEASURED.json at the repo root; bench.py reports it
alongside the GPU estimate.

Usage: python scripts/measure_reference_baseline.py [--batches N]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time
import types

import numpy as np
import torch

REF_CODE = "/root/reference/code"
OUT = pathlib.Path(__file__).resolve().parent.parent / "BASELINE_MEASURED.json"


def import_reference():
    """Import the reference modules with CPU patches (same machinery as
    tests/test_reference_differential.py)."""
    sys.dont_write_bytecode = True  # /root/reference is read-only
    for name in ("pyxis", "ipdb"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if "line_profiler" not in sys.modules:
        lp = types.ModuleType("line_profiler")

        class _LineProfiler:
            def print_stats(self, *a, **k):
                pass

            def __call__(self, fn):
                return fn

        lp.LineProfiler = _LineProfiler
        sys.modules["line_profiler"] = lp

    sys.path.insert(0, REF_CODE)
    try:
        import constants  # noqa: F401
        import utils
        import models
    finally:
        sys.path.remove(REF_CODE)

    def torchize_cpu(X):
        return torch.from_numpy(np.array(X))

    utils.torchize = torchize_cpu
    models.torchize = torchize_cpu

    # every reference module defaults device="cuda" in __init__ signatures
    # (models.py:19,29,67,231,353); rewrite the defaults to "cpu"
    for cls in (
        models.Model,
        models.EMGNet,
        models.GLOVENet,
        models.AdaBatchNorm1d,
        models.AdaBatchNorm2d,
    ):
        d = cls.__init__.__defaults__
        cls.__init__.__defaults__ = tuple(
            "cpu" if x == "cuda" else x for x in d
        )
    return types.SimpleNamespace(constants=constants, models=models)


class _TaskWrapperShaped(torch.utils.data.Dataset):
    """Synthetic stand-in with TaskWrapper's exact per-item output
    (utils.py:51-64): the store is device-resident and items are gathers,
    so contents don't affect throughput — only shapes and the gather do."""

    def __init__(self, D, T, emg_dim, glove_dim, seed=0):
        g = torch.Generator().manual_seed(seed)
        self.EMG = torch.randn(D, T, 1, 1, emg_dim, generator=g)
        self.GLOVE = torch.randn(D, T, glove_dim, generator=g)
        self.T = T

    def __len__(self):
        return self.EMG.shape[0]

    def __getitem__(self, idx):
        return (
            self.EMG[idx],
            self.GLOVE[idx],
            torch.arange(self.T, dtype=torch.long),
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=40,
                    help="timed batches (each = batch_size·41 windows)")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--eval_passes", type=int, default=2,
                    help="timed full test-split eval passes")
    args = ap.parse_args()

    ref = import_reference()
    C = ref.constants
    torch.manual_seed(42)

    # go.sh:5 configuration: --no_adabn (plain BN), d_e=16, batch_size 8,
    # db3 train geometry D = 6 people · 3 reps · 100 = 1800 (load.py:217-223)
    params = {
        "d_e": 16, "dp_emg": 0.5, "dp_glove": 0.3,
        "lr_emg": 1e-3, "lr_glove": 1e-3,
        "reg_emg": 1e-6, "reg_glove": 1e-6,
    }
    model = ref.models.Model(
        params=params, train_model=True, adabn=False, prediction=False,
        glove=False, device="cpu",
    ).to(torch.float32)
    model.set_train()

    opt_e = torch.optim.Adam(model.emg_net.parameters(), lr=params["lr_emg"],
                             weight_decay=0)
    opt_g = torch.optim.Adam(model.glove_net.parameters(),
                             lr=params["lr_glove"], weight_decay=0)

    D = 6 * 3 * 100
    ds = _TaskWrapperShaped(D, C.MAX_TASKS, C.EMG_DIM, C.GLOVE_DIM)
    loader = torch.utils.data.DataLoader(
        ds, batch_size=args.batch_size, shuffle=True
    )

    def step(EMG, GLOVE, label):
        label = label.reshape(-1)
        logits = model.forward(EMG, GLOVE, label)
        loss = model.loss(logits, label)
        loss = loss + model.l2()
        opt_e.zero_grad(set_to_none=True)
        opt_g.zero_grad(set_to_none=True)
        loss.backward()
        opt_e.step()
        opt_g.step()
        return loss

    it = iter(loader)
    for _ in range(3):  # warm-up
        step(*next(it))

    n = 0
    t0 = time.perf_counter()
    for EMG, GLOVE, label in loader:
        step(EMG, GLOVE, label)
        n += 1
        if n >= args.batches:
            break
    dt = time.perf_counter() - t0

    windows = n * args.batch_size * C.MAX_TASKS
    wps = windows / dt

    # ---- eval/voting throughput (train.py:27-44 test(): forward + the
    # Model.loss eval path with its per-item CE rows and per-prefix
    # torch.mode voting loops, models.py:138-163) ----
    class _EvalShaped(torch.utils.data.Dataset):
        """TaskWrapper eval item (load.py:264-266): EMG (T, W, 1, 12)."""

        def __init__(self, D, T, W, emg_dim, glove_dim, seed=1):
            g = torch.Generator().manual_seed(seed)
            self.EMG = torch.randn(D, T, W, 1, emg_dim, generator=g)
            self.GLOVE = torch.randn(D, T, glove_dim, generator=g)
            self.T = T

        def __len__(self):
            return self.EMG.shape[0]

        def __getitem__(self, idx):
            return (self.EMG[idx], self.GLOVE[idx],
                    torch.arange(self.T, dtype=torch.long))

    W = C.PREDICTION_WINDOW_SIZE
    D_test = 6 * 2 * 4  # test voting groups (load.py:217-223)
    eval_ds = _EvalShaped(D_test, C.MAX_TASKS, W, C.EMG_DIM, C.GLOVE_DIM)
    eval_loader = torch.utils.data.DataLoader(
        eval_ds, batch_size=args.batch_size * 8  # train.py:32
    )
    model.set_test()

    def eval_pass():
        for EMG, GLOVE, label in eval_loader:
            label = label.reshape(-1)
            with torch.no_grad():
                logits = model.forward(EMG, GLOVE, label)
                model.loss(logits, label)

    eval_pass()  # warm-up
    passes = max(1, args.eval_passes)
    t0 = time.perf_counter()
    for _ in range(passes):
        eval_pass()
    dt_eval = time.perf_counter() - t0
    eval_windows = passes * D_test * C.MAX_TASKS * W
    eval_wps = eval_windows / dt_eval
    result = {
        "metric": "reference_train_windows_per_sec",
        "value": round(wps, 1),
        "unit": "windows/s",
        "hardware": "CPU (torch CPU build; reference targets a 12 GB GPU)",
        "torch_threads": torch.get_num_threads(),
        "batches_timed": n,
        "batch_size": args.batch_size,
        "windows_per_batch": int(args.batch_size * C.MAX_TASKS),
        "seconds": round(dt, 3),
        "reference_eval_windows_per_sec": round(eval_wps, 1),
        "eval_passes_timed": passes,
        "eval_seconds": round(dt_eval, 3),
        "eval_note": (
            "test() path (train.py:27-44): forward + Model.loss eval "
            "voting (models.py:138-163 python loops incl. the 249-prefix "
            "torch.mode sweep), full 48-group test split per pass"
        ),
        "gpu_estimate_wps": 7380.0,
        "note": (
            "Measured by running the reference's own Model/train-loop body "
            "(train.py:86-108) on CPU with TaskWrapper-shaped synthetic "
            "batches; the documented ~7,380 windows/s GPU estimate remains "
            "the honest upper bound for its original hardware."
        ),
    }
    OUT.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
