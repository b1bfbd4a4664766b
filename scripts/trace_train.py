"""Op-level attribution of the single-run train epoch's device time.

Companion to scripts/trace_sweep.py (same perfetto aggregation) for the
canonical bench train geometry (contrastive, plain BN, bs=8 — bench.py
phase_train): runs ``train_epochs`` under jax.profiler and prints the
top ops by total device time, the datum that decides whether a fused
train-step kernel is worth building (what share of the ~131 µs step is
Adam/HBM vs matmul vs BN/dropout glue vs scheduling gaps).

Usage: python scripts/trace_train.py [--epochs N] [--batch_size B]
           [--compute_dtype bfloat16] [--pallas_loss]
       python scripts/trace_train.py --platform cpu --quick  (smoke test)
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import re
import sys
import time
from collections import defaultdict

LOGDIR = "/tmp/train_trace_perfetto"


def aggregate_perfetto(logdir: str, top_k: int = 25) -> float:
    """Parse the newest perfetto trace under ``logdir`` and print the
    top-k ops by total device time. Returns total attributed seconds."""
    paths = glob.glob(f"{logdir}/**/*.json.gz", recursive=True)
    if not paths:
        print("no perfetto trace found", file=sys.stderr)
        return 0.0
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace

    per_op = defaultdict(float)
    total = 0.0
    for ev in events:
        if not isinstance(ev, dict) or ev.get("ph") != "X":
            continue
        dur = ev.get("dur", 0) / 1e6  # µs → s
        name = ev.get("name", "")
        if dur <= 0:
            continue
        if re.match(r"^(fusion|copy|dynamic|loop_|while|convolution|dot|"
                    r"custom-call|all-|reduce|scatter|gather|select|rng|"
                    r"transpose|broadcast|iota|add|sub|mul|bitcast|convert|"
                    r"slice|concatenate|cumsum|tuple|get-tuple)", name):
            base = re.sub(r"[.\d]+$", "", name)
            per_op[base] += dur
            total += dur
    print(f"total attributed device time: {total:.3f}s")
    for name, t in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_k]:
        print(f"{t:8.3f}s  {100 * t / total:5.1f}%  {name}")
    return total


def main(argv=None):
    from contrastiveprosthetics_tpu.utils.platform import (
        add_platform_flag, select_platform,
    )

    parser = argparse.ArgumentParser(description=__doc__)
    add_platform_flag(parser)
    parser.add_argument("--quick", action="store_true",
                        help="tiny run — correctness smoke, not timing")
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--compute_dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--pallas_loss", action="store_true",
                        help="trace with the fused Pallas loss kernel on")
    parser.add_argument("--fused_train", action="store_true",
                        help="trace with the fused training chain "
                        "(ops/train_fused.py) on")
    args = parser.parse_args(argv)
    select_platform(args.platform)
    if args.quick:
        args.epochs = 1
        args.batch_size = 0  # resolved to D below: a single-batch epoch
        # bypasses lax.scan — XLA:CPU runs sizeable scan bodies ~20×
        # slower than straight-line code (CLAUDE.md)

    from contrastiveprosthetics_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG as cfg
    from contrastiveprosthetics_tpu.data.store import DeviceStore
    from contrastiveprosthetics_tpu.data.synthetic import make_processed_dataset
    from contrastiveprosthetics_tpu.train.engine import Hyper, Trainer

    emg, pos, glove = make_processed_dataset(cfg)
    store = DeviceStore(cfg, emg, pos, glove)
    if args.batch_size == 0:
        args.batch_size = int(store.view("train").D)
    trainer = Trainer(cfg, store, adabn=False, batch_size=args.batch_size,
                      use_pallas_loss=args.pallas_loss,
                      use_fused_train=args.fused_train or None,
                      compute_dtype=args.compute_dtype)
    hyper = Hyper.single(1e-3, 1e-4, 0.15, 1e-3, 1e-4, 0.15)
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key)
    ones = np.ones(args.epochs, np.float32)

    def run(st, seed):
        st, losses, _ = trainer.train_epochs(
            st, jax.random.split(jax.random.fold_in(key, seed), args.epochs),
            hyper, ones, ones,
        )
        return st, float(np.asarray(losses)[-1])  # host readback

    state, _ = run(state, 1)  # compile + warm
    if args.quick:
        wall = float("nan")  # quick timings are meaningless; skip a run
    else:
        t0 = time.perf_counter()
        state, _ = run(state, 2)
        wall = time.perf_counter() - t0

    jax.profiler.start_trace(LOGDIR, create_perfetto_trace=True)
    state, _ = run(state, 3)
    jax.profiler.stop_trace()

    v = trainer.view_train
    steps = (v.D // args.batch_size) * args.epochs
    wpe = (v.D // args.batch_size) * args.batch_size * v.n_tasks
    print(f"devices: {jax.devices()[0].platform} | {args.epochs} epochs, "
          f"{steps} steps, bs={args.batch_size}, "
          f"dtype={args.compute_dtype}, pallas_loss={args.pallas_loss}, "
          f"fused_train={trainer.use_fused_train}")
    print(f"untraced wall: {wall:.3f}s → {wall / steps * 1e6:.1f} µs/step, "
          f"{wpe * args.epochs / wall / 1e6:.2f}M windows/s")
    total = aggregate_perfetto(LOGDIR)
    if total > 0:
        print(f"attributed/step: {total / steps * 1e6:.1f} µs")


if __name__ == "__main__":
    main()
