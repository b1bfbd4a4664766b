"""Runnable library-API quickstart (the executable form of docs/API.md).

End to end on synthetic data, no Ninapro download, no TPU required:
dataset → train → evaluate → artifacts → parity self-check → checkpoint
round trip → streaming inference. Geometry is shrunk so the whole script
runs in ~2 min on one CPU core (single-batch epochs dodge the XLA:CPU
lax.scan pathology; narrow model keeps compiles fast — see CLAUDE.md);
on a TPU host run with ``--platform tpu`` and full geometry.

Run:  python examples/quickstart.py [--platform {auto,cpu,tpu}]
Test: tests/test_quickstart_example.py (slow tier) runs this file.
"""
from __future__ import annotations

import argparse
import os
import tempfile

from contrastiveprosthetics_tpu.utils.platform import (
    add_platform_flag,
    select_platform,
)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    add_platform_flag(p)
    p.add_argument("--out_dir", default=None,
                   help="artifact directory (default: a temp dir)")
    args = p.parse_args(argv)
    select_platform(args.platform)

    import jax
    import numpy as np

    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG as cfg
    from contrastiveprosthetics_tpu.data.store import DeviceStore
    from contrastiveprosthetics_tpu.data.synthetic import (
        make_processed_dataset,
    )
    from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
    from contrastiveprosthetics_tpu.results.export import export_results
    from contrastiveprosthetics_tpu.results.parity import (
        Tolerances,
        compare_results,
    )
    from contrastiveprosthetics_tpu.serve.stream import StreamingEngine
    from contrastiveprosthetics_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from contrastiveprosthetics_tpu.train.engine import Hyper, Trainer
    from contrastiveprosthetics_tpu.train.loop import run_test, train_loop

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="cptpu_quickstart_")
    key = jax.random.PRNGKey(0)

    # ---- dataset: fabricate an already-ingested tensor, device-resident
    emg, positions, glove = make_processed_dataset(
        cfg, people_positions=[40], separability=6.0, seed=3
    )
    store = DeviceStore(cfg, emg, positions, glove)

    # ---- train (plain BN so the streaming engine below can serve it)
    trainer = Trainer(
        cfg, store, adabn=False,
        batch_size=store.view("train").D,   # single-batch epochs (CPU-fast)
        n_linear=2, hidden=64,              # narrow model (CPU-fast)
    )
    hyper = Hyper.single(1e-2, 1e-6, 0.2, 1e-2, 1e-6, 0.2)
    res = train_loop(trainer, hyper, epochs=5, key=key, annealing=True,
                     verbose=False)
    print(f"trained: val acc {float(res.val_acc):.3f}")

    # ---- voted test evaluation + reference-identical artifacts
    test_res = run_test(trainer, res.state, hyper, key)
    print(f"test: voted acc {float(test_res.accuracy):.3f}")
    export_results(test_res, out_dir, n_classes=cfg.max_tasks,
                   sweep_trials=8, plot=False)

    # ---- machine-checkable parity: a results dir diffs cleanly vs itself
    report = compare_results(out_dir, out_dir, Tolerances())
    assert report.ok, report
    print(f"parity self-check: PASS ({len(report.rows)} artifact rows)")

    # ---- checkpoint round trip reproduces the eval bitwise
    ckpt = os.path.join(out_dir, "contrastive.msgpack")
    save_checkpoint(ckpt, res.state)
    state2 = load_checkpoint(ckpt, trainer.init_state(key))
    test2 = run_test(trainer, state2, hyper, key)
    assert float(test2.accuracy) == float(test_res.accuracy)
    print("checkpoint round trip: identical voted accuracy")

    # ---- streaming inference at prosthesis-control latency
    model = ContrastiveModel(d_e=trainer.d_e, adabn=False,
                             n_classes=cfg.max_tasks,
                             n_linear=2, hidden=64)
    variables = {"params": res.state.params,
                 "batch_stats": res.state.batch_stats}
    eng = StreamingEngine(cfg, model, variables,
                          emg_mean=np.zeros(cfg.emg_dim, np.float32),
                          emg_std=np.ones(cfg.emg_dim, np.float32))
    rng = np.random.default_rng(0)
    recording = rng.standard_normal((cfg.factor * 50, cfg.emg_dim))
    recording = recording.astype(np.float32)
    eng.calibrate(recording[: cfg.factor * 20])   # per-user BN statistics
    preds, votes = eng.run(recording)             # whole recording, ONE dispatch
    print(f"streamed {len(preds)} ticks; last vote = class {int(votes[-1])}")

    print(f"artifacts in {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
