"""A/B one leg of the fused-training-chain experiment (ops/train_fused.py).

One leg per PROCESS (the repo's contamination rule: large programs
degrade later large programs in the same process — bench.py
phase_train_peak runs in its own subprocess for the same reason), so a
driver shell alternates invocations:

    for trial in 1 2 3; do
      python scripts/ab_fused_train.py --batch_size 128 \
          --compute_dtype bfloat16 --leg fused
      python scripts/ab_fused_train.py --batch_size 128 \
          --compute_dtype bfloat16 --leg xla
    done

Prints ONE JSON line: the marginal windows/s slope between a short and a
long one-dispatch epoch scan, each timed to host readback (the fixed
tunnel RTT cancels in the difference — CLAUDE.md measurement rules).
Epoch keys use the TPU hardware RNG (rbg), the shipped default.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_tpu"),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", choices=("fused", "xla"), required=True)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--e_lo", type=int, default=5)
    ap.add_argument("--e_hi", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3,
                    help="timed reps per length; first is compile/warm; "
                    "must be >= 2 so one warm rep survives")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.reps < 2:
        ap.error("--reps must be >= 2 (rep 0 is compile/warm-up only)")
    from contrastiveprosthetics_tpu.utils.platform import select_platform

    select_platform(args.platform)
    import jax
    import numpy as np

    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG as cfg
    from contrastiveprosthetics_tpu.data.store import DeviceStore
    from contrastiveprosthetics_tpu.data.synthetic import (
        make_processed_dataset,
    )
    from contrastiveprosthetics_tpu.train.engine import Hyper, Trainer

    dev = jax.devices()[0]
    emg, pos, glove = make_processed_dataset(cfg)
    store = DeviceStore(cfg, emg, pos, glove, device=dev)
    tr = Trainer(
        cfg, store, adabn=False, batch_size=args.batch_size,
        compute_dtype=args.compute_dtype,
        use_fused_train=(args.leg == "fused"),
    )
    v = tr.view_train
    wpe = v.D * v.n_tasks  # drop_last=False: every item trains

    hyper = Hyper.single(1e-3, 1e-6, 0.5, 1e-3, 1e-6, 0.3)
    key = jax.random.PRNGKey(0)
    root = key
    impl = "threefry"
    if jax.default_backend() == "tpu":
        root, impl = jax.random.key(0, impl="rbg"), "rbg"

    def run(n_epochs: int) -> float:
        st = tr.init_state(key)
        ones = np.ones(n_epochs, np.float32)
        best = float("inf")
        for i in range(args.reps):
            t0 = time.perf_counter()
            st, losses, _ = tr.train_epochs(
                st, jax.random.split(jax.random.fold_in(root, i), n_epochs),
                hyper, ones, ones,
            )
            np.asarray(losses)  # host readback = the only reliable sync
            dt = time.perf_counter() - t0
            if i > 0:
                best = min(best, dt)
        return best

    t_lo, t_hi = run(args.e_lo), run(args.e_hi)
    out = {
        "leg": args.leg, "batch_size": args.batch_size,
        "compute_dtype": args.compute_dtype, "prng_impl": impl,
        "t_lo_s": round(t_lo, 4), "t_hi_s": round(t_hi, 4),
    }
    if t_hi - t_lo <= 0:
        # Timing jitter swallowed the marginal slope — refuse to publish
        # a negative/infinite rate (same rule as bench.py's slope_us).
        out["error"] = "non_positive_slope"
    else:
        out["windows_per_sec"] = round(
            (args.e_hi - args.e_lo) * wpe / (t_hi - t_lo), 1)
        out["us_per_step"] = round(
            1e6 * (t_hi - t_lo)
            / ((args.e_hi - args.e_lo) * -(-v.D // args.batch_size)), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
    sys.stderr.flush()
