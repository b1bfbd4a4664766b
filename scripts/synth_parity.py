"""Whole-system accuracy differential: the reference's OWN train_loop vs
this framework, trained on byte-identical synthetic data (VERDICT r2 #1).

Stage-level differentials (tests/test_reference_differential.py) pin every
component; this harness pins the *machine*: it materializes ONE synthetic
ingested dataset, hands the exact same split tensors to

  * the reference's ``train_loop`` (/root/reference/code/train.py:65-138),
    running its real ``Model`` / two-Adam / scheduler / ``TaskWrapper``
    batching / loopy loss / ``test()`` voting on CPU torch, and
  * this framework's ``Trainer``/``train_loop``/``run_test``,

for N seeds each, then compares voted test accuracy, the 24-col voting
curve, and the set-size mean-grasp curve (our reconstructed
``subset_size_sweep`` applied to BOTH systems' frame logits — same
analysis code on both logit sets).

Byte identity: the torch side consumes ``np.asarray`` exports of the very
``SplitView`` arrays our trainer gathers from (``emg_flat``,
``emg_groups``, ``glove_flat``), so there is no independent re-derivation
of masks/splits that could diverge — both machines see the same floats.
RNG streams CANNOT be shared across torch and jax, so the comparison is
seed-spread overlap, not bitwise (SURVEY §7 "RNG parity").

Writes SYNTH_PARITY.json (+ optionally regenerates SYNTH_PARITY.md) and
prints one JSON line. The reduced geometry used by the slow test:
``--people 2 --epochs 4 --seeds 2 --batch_size 600 --trials 16``.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
SCRIPTS = pathlib.Path(__file__).resolve().parent


# --------------------------------------------------------------- torch side
def _import_reference_train():
    """The reference's train module with CPU patches: reuses the import
    machinery of measure_reference_baseline.py, then additionally imports
    ``train`` with a CPU-forcing Model and a synthetic ``args``."""
    sys.path.insert(0, str(SCRIPTS))
    try:
        from measure_reference_baseline import import_reference
    finally:
        sys.path.remove(SCRIPTS.as_posix())
    ref = import_reference()

    import types

    sys.path.insert(0, "/root/reference/code")
    try:
        import train as train_mod
        import utils as ref_utils
    finally:
        sys.path.remove("/root/reference/code")

    class _CpuModel(ref.models.Model):
        """train_loop passes device="cuda" explicitly (train.py:66);
        force CPU without touching the reference source."""

        def __init__(self, *a, **kw):
            kw["device"] = "cpu"
            super().__init__(*a, **kw)

    train_mod.Model = _CpuModel

    # torch 2.x removed the `verbose` kwarg the reference passes to its
    # schedulers (train.py:76-80); shim it away without touching source
    import functools

    import torch.optim as _optim

    def _drop_verbose(cls):
        @functools.wraps(cls)
        def make(*a, **kw):
            kw.pop("verbose", None)
            return cls(*a, **kw)

        return make

    train_mod.optim = types.SimpleNamespace(
        Adam=_optim.Adam,
        lr_scheduler=types.SimpleNamespace(
            CosineAnnealingLR=_drop_verbose(
                _optim.lr_scheduler.CosineAnnealingLR
            ),
            StepLR=_drop_verbose(_optim.lr_scheduler.StepLR),
        ),
    )
    return types.SimpleNamespace(
        train=train_mod, utils=ref_utils, models=ref.models,
        constants=ref.constants,
    )


class _GloverShim:
    """Stands in for Glover-after-load_valid: a flat (n_tasks·D_g,
    glove_dim) row store (utils.py:248-254). Contrastive GLOVENet ignores
    the values (one-hot path, models.py:411-414) but the plumbing is
    exercised."""

    def __init__(self, glove_flat, D):
        self.GLOVE_use = glove_flat
        self.D = int(D)

    def load_valid(self, tasks_mask=None):  # called by DB23.load_valid
        pass

    def __getitem__(self, idx):
        return self.GLOVE_use[idx]


class _DB23Shim:
    """Stands in for DB23-after-load_valid, backed by OUR SplitView
    exports: ``train`` split holds EMG_use (n_tasks·D, 12) single frames
    (load.py:233-240,256-259), eval splits hold the (n_tasks·D, 25, 12)
    voting blocks (load.py:264-266). Indexing semantics are exactly
    DB23.__getitem__'s; TaskWrapper (the reference's own class) drives it
    unmodified."""

    def __init__(self, n_tasks, views, glover):
        self.TASKS = int(n_tasks)
        self.glover = glover
        self._views = views  # split -> (tensor, D)
        self._cur = "train"
        self.train = True

    def set_train(self):
        self.train, self._cur = True, "train"

    def set_val(self):
        self.train, self._cur = False, "val"

    def set_test(self):
        self.train, self._cur = False, "test"

    @property
    def D(self):
        return int(self._views[self._cur][1])

    def __len__(self):
        return self.TASKS * self.D

    def __getitem__(self, idx):
        arr = self._views[self._cur][0]
        if self.train:
            return arr[idx].reshape(-1, 1, 1, arr.shape[-1])
        return arr[idx].unsqueeze(2)  # (B, 25, 1, 12)


def run_reference_side(view_arrays, hyper, epochs, batch_size, seeds,
                       adabn=False):
    """Train/test the reference's own machinery once per seed.

    Returns a list of per-seed dicts with voted accuracy, the (D, 24)
    voting curve, and (D·25, 41, 41) frame logits."""
    import torch

    r = _import_reference_train()
    r.train.args = argparse.Namespace(
        # store_false semantics: no_adabn=True means AdaBN ON (train.py:66)
        no_adabn=bool(adabn), prediction=False, glove=False,
        batch_size=int(batch_size), final_epochs=int(epochs),
    )

    n_tasks = view_arrays["n_tasks"]
    results = []
    for seed in seeds:
        torch.manual_seed(seed)
        np.random.seed(seed)
        views = {
            "train": (torch.from_numpy(view_arrays["train_flat"]),
                      view_arrays["D_train"]),
            "val": (torch.from_numpy(view_arrays["val_groups"]),
                    view_arrays["D_val"]),
            "test": (torch.from_numpy(view_arrays["test_groups"]),
                     view_arrays["D_test"]),
        }
        glover = _GloverShim(
            torch.from_numpy(view_arrays["glove_flat"]),
            view_arrays["D_glove"],
        )
        tw = r.utils.TaskWrapper(_DB23Shim(n_tasks, views, glover))
        tw.device = torch.device("cpu")  # utils.py:24 hardcodes cuda

        params = dict(hyper)
        params["epochs"] = int(epochs)
        t0 = time.perf_counter()
        _, model = r.train.train_loop(
            tw, params, checkpoint=False, annealing=True, verbose=True,
        )
        # final test (train.py:27-44): voted accuracy from model.correct()
        _, acc = r.train.test(model, tw)
        # voting curve: the loopy loss appends 249 prefix columns
        # (models.py:153 iterates range(1, PREDICTION_WINDOW)); the
        # artifact shape is the first 24 (voting.npy (48, 24))
        curve = model.voting_raw()[:, :24]

        # frame logits for the set-size sweep (results.py:32-40 layout)
        tw.set_test()
        model.set_test()
        model.reset()
        loader = torch.utils.data.DataLoader(tw, batch_size=8, shuffle=False)
        outs = []
        with torch.no_grad():
            for EMG, GLOVE, label in loader:
                outs.append(
                    model.forward(EMG, GLOVE, label.reshape(-1))
                    .cpu().numpy()
                )
        logits = np.concatenate(outs)  # (D_test·25, 41, 41)
        results.append({
            "seed": int(seed),
            "acc": float(acc),
            "curve": np.asarray(curve, np.float64),
            "logits": logits,
            "seconds": round(time.perf_counter() - t0, 1),
        })
        print(f"[reference seed {seed}] voted acc {acc:.4f} "
              f"({results[-1]['seconds']} s)", file=sys.stderr)
    return results


# ----------------------------------------------------------------- our side
def run_our_side(store, cfg, hyper_dict, epochs, batch_size, seeds,
                 adabn=False):
    import jax

    from contrastiveprosthetics_tpu.train.engine import Hyper, Trainer
    from contrastiveprosthetics_tpu.train.loop import run_test, train_loop

    trainer = Trainer(cfg, store, adabn=adabn, batch_size=int(batch_size))
    hyper = Hyper.single(
        lr_emg=hyper_dict["lr_emg"], reg_emg=hyper_dict["reg_emg"],
        dp_emg=hyper_dict["dp_emg"], lr_glove=hyper_dict["lr_glove"],
        reg_glove=hyper_dict["reg_glove"], dp_glove=hyper_dict["dp_glove"],
    )
    results = []
    for seed in seeds:
        t0 = time.perf_counter()
        res = train_loop(
            trainer, hyper, epochs=int(epochs),
            key=jax.random.PRNGKey(seed), annealing=True, verbose=False,
        )
        t = run_test(trainer, res.state, hyper, jax.random.PRNGKey(seed + 1000))
        results.append({
            "seed": int(seed),
            "acc": float(t.accuracy),
            "curve": np.asarray(t.curve, np.float64),
            "logits": np.asarray(t.logits, np.float32),
            "seconds": round(time.perf_counter() - t0, 1),
        })
        print(f"[ours seed {seed}] voted acc {float(t.accuracy):.4f} "
              f"({results[-1]['seconds']} s)", file=sys.stderr)
    return results, trainer


# ------------------------------------------------------------------ compare
def summarize(ref_runs, our_runs, trials, n_preds, sweep_seed=0):
    from contrastiveprosthetics_tpu.eval.subset_sweep import subset_size_sweep

    def agg(runs):
        accs = np.array([r["acc"] for r in runs])
        curves = np.stack([r["curve"].mean(0) for r in runs])
        grasp = np.stack([
            subset_size_sweep(r["logits"], trials=trials, seed=sweep_seed).mean
            for r in runs
        ])
        return accs, curves.mean(0), curves, grasp.mean(0), grasp

    acc_r, curve_r, curves_r, grasp_r, grasps_r = agg(ref_runs)
    acc_o, curve_o, curves_o, grasp_o, grasps_o = agg(our_runs)

    gap = abs(acc_o.mean() - acc_r.mean())
    spread = float(acc_r.std(ddof=0) + acc_o.std(ddof=0))
    # Overlap criterion: the cross-system mean gap must sit inside the
    # systems' own noise — 2× pooled seed std, floored by the BINOMIAL
    # noise of the eval set itself (n_preds = D_test·n_tasks voted
    # predictions; two independent systems → variance doubles). At the
    # canonical geometry (n=1968) the floors are ~0.03/0.05/0.09; reduced
    # single-seed geometries get proportionally wider bands instead of a
    # false FAIL on sampling noise.
    p = float(np.clip((acc_r.mean() + acc_o.mean()) / 2, 0.05, 0.95))
    binom = np.sqrt(2.0 * p * (1.0 - p) / n_preds)
    scale = np.sqrt(1968.0 / n_preds)
    tol_acc = max(2.0 * spread, 0.03, 3.0 * binom)
    curve_gap = float(np.abs(curve_o - curve_r).max())
    curve_spread = float(
        np.abs(curves_r - curve_r).max() + np.abs(curves_o - curve_o).max()
    )
    # curve/grasp compare MAX deviation over 24/40 correlated columns —
    # base bands calibrated at full geometry, binomial-scaled elsewhere
    tol_curve = max(2.0 * curve_spread, 0.05 * scale)
    grasp_gap = float(np.abs(grasp_o[1:] - grasp_r[1:]).max())
    grasp_spread = float(
        np.abs(grasps_r - grasp_r).max() + np.abs(grasps_o - grasp_o).max()
    )
    tol_grasp = max(2.0 * grasp_spread, 0.09 * scale)

    return {
        "reference": {
            "acc_per_seed": [round(float(a), 4) for a in acc_r],
            "acc_mean": round(float(acc_r.mean()), 4),
            "acc_std": round(float(acc_r.std(ddof=0)), 4),
            "curve_mean": [round(float(x), 4) for x in curve_r],
            "grasp_mean": [round(float(x), 4) for x in grasp_r],
        },
        "ours": {
            "acc_per_seed": [round(float(a), 4) for a in acc_o],
            "acc_mean": round(float(acc_o.mean()), 4),
            "acc_std": round(float(acc_o.std(ddof=0)), 4),
            "curve_mean": [round(float(x), 4) for x in curve_o],
            "grasp_mean": [round(float(x), 4) for x in grasp_o],
        },
        "acc_gap": round(float(gap), 4),
        "acc_tol": round(float(tol_acc), 4),
        "acc_ok": bool(gap <= tol_acc),
        "curve_gap": round(curve_gap, 4),
        "curve_tol": round(float(tol_curve), 4),
        "curve_ok": bool(curve_gap <= tol_curve),
        "grasp_gap": round(grasp_gap, 4),
        "grasp_tol": round(float(tol_grasp), 4),
        "grasp_ok": bool(grasp_gap <= tol_grasp),
        "ok": bool(gap <= tol_acc and curve_gap <= tol_curve
                   and grasp_gap <= tol_grasp),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--people", type=int, default=6,
                    help="db3 subjects to fabricate (canonical: 6)")
    ap.add_argument("--epochs", type=int, default=8,
                    help="final-train epochs (go.sh:5 budget: 8)")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--separability", type=float, default=1.0,
                    help="class-signal scale; ~1.0 puts voted accuracy "
                         "mid-range where differences are detectable")
    ap.add_argument("--trials", type=int, default=144,
                    help="subset-sweep trials per size (reference: 144)")
    ap.add_argument("--adabn", action="store_true",
                    help="AdaBN leg (default: --no_adabn, the go.sh:3 "
                         "headline config)")
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="lr for both nets and both systems (the reduced "
                         "big-batch test config needs a higher lr to "
                         "learn in few optimizer steps)")
    ap.add_argument("--out", default=str(REPO / "SYNTH_PARITY.json"))
    ap.add_argument("--platform", default=None,
                    help="jax platform for OUR side (cpu to avoid the "
                         "TPU tunnel; torch side is always CPU)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG as cfg
    from contrastiveprosthetics_tpu.data.store import DeviceStore
    from contrastiveprosthetics_tpu.data.synthetic import make_processed_dataset

    positions = list(range(40, 40 + args.people))
    emg, pos, glove = make_processed_dataset(
        cfg, people_positions=positions, separability=args.separability,
        seed=0,
    )
    store = DeviceStore(cfg, emg, pos, glove)

    # canonical demo hyperparameters (the repo-wide differential config;
    # the 150-config random search is validated stage-wise elsewhere and
    # cannot share RNG streams across frameworks anyway)
    hyper = {
        "d_e": 16, "lr_emg": args.lr, "reg_emg": 1e-6, "dp_emg": 0.5,
        "lr_glove": args.lr, "reg_glove": 1e-6, "dp_glove": 0.3,
    }
    seeds = list(range(args.seeds))

    our_runs, trainer = run_our_side(
        store, cfg, hyper, args.epochs, args.batch_size, seeds,
        adabn=args.adabn,
    )

    # byte-identical handoff: the torch side consumes OUR materialized
    # SplitViews
    v_tr, v_val, v_te = (
        trainer.view_train, trainer.view_val, trainer.view_test
    )
    W = cfg.prediction_window_size
    view_arrays = {
        "n_tasks": v_tr.n_tasks,
        "train_flat": np.asarray(v_tr.emg_flat, np.float32),
        "D_train": v_tr.D,
        "val_groups": np.asarray(v_val.emg_groups, np.float32),
        "D_val": v_val.D,
        "test_groups": np.asarray(v_te.emg_groups, np.float32),
        "D_test": v_te.D,
        "glove_flat": np.asarray(v_tr.glove_flat, np.float32),
        "D_glove": v_tr.D_glove,
    }
    assert view_arrays["test_groups"].shape[1] == W

    ref_runs = run_reference_side(
        view_arrays, hyper, args.epochs, args.batch_size, seeds,
        adabn=args.adabn,
    )

    n_preds = view_arrays["D_test"] * view_arrays["n_tasks"]
    summary = summarize(ref_runs, our_runs, trials=args.trials,
                        n_preds=n_preds)
    summary["config"] = {
        "people": args.people, "epochs": args.epochs,
        "seeds": args.seeds, "batch_size": args.batch_size,
        "separability": args.separability, "trials": args.trials,
        "adabn": bool(args.adabn), "hyper": hyper,
        "D_train": view_arrays["D_train"],
        "D_test": view_arrays["D_test"],
    }
    pathlib.Path(args.out).write_text(json.dumps(summary, indent=1) + "\n")
    print(json.dumps({
        "acc_ref": summary["reference"]["acc_mean"],
        "acc_ours": summary["ours"]["acc_mean"],
        "acc_gap": summary["acc_gap"], "acc_tol": summary["acc_tol"],
        "curve_gap": summary["curve_gap"], "grasp_gap": summary["grasp_gap"],
        "ok": summary["ok"],
    }))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
