"""Streaming-inference CLI (``cptpu-serve``) — the user surface for the
serve engine (serve/stream.py), a beyond-reference capability (the
reference only evaluates offline; BASELINE.json config 5).

Streams a raw 2 kHz recording through the online pipeline (stateful
bandpass → trailing RMS → encoder → subset-masked scores → majority vote)
one 10 ms control tick at a time and reports per-tick predictions, the
running majority vote, and measured tick latency.

Inputs:
  --checkpoint   msgpack TrainState from ``cptpu-train`` (train.py:122-126
                 equivalent); serve requires a plain-BN model (--no_adabn).
  --data_dir     where ``emg_mean.npy``/``emg_std.npy`` live (ingest stats).
  --recording    .npy (T, 12) raw 2 kHz samples, or .npz with key ``emg``;
                 with --sessions S also (S, T, 12).
  --calibrate    optional calibration recording — online AdaBN
                 re-estimation of BN statistics before streaming
                 (per session with --sessions).
  --subset       comma-separated class ids to restrict prediction to
                 (the set-size restriction, README.md:15).
  --sessions     serve S concurrent sessions via the vmapped batched tick.
  --demo         fabricate recording+stats+weights (no files needed).
"""
from __future__ import annotations

import argparse
import os
import time

from contrastiveprosthetics_tpu.utils.platform import (
    add_platform_flag,
    select_platform,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Stream a recording through the online inference engine"
    )
    p.add_argument("--checkpoint", type=str, default=None,
                   help="TrainState msgpack (default: fresh-init weights)")
    p.add_argument("--data_dir", type=str, default="data")
    p.add_argument("--recording", type=str, default=None)
    p.add_argument("--calibrate", type=str, default=None)
    p.add_argument("--subset", type=str, default=None,
                   help="comma-separated class ids, e.g. 3,7,12")
    p.add_argument("--sessions", type=int, default=1)
    p.add_argument("--seconds", type=float, default=2.0,
                   help="--demo recording length")
    p.add_argument("--d_e", type=int, default=16)
    p.add_argument("--out", type=str, default=None,
                   help="save preds/votes (npz)")
    p.add_argument("--demo", action="store_true",
                   help="synthetic recording + fresh weights (no files)")
    p.add_argument("--spmd", action="store_true",
                   help="shard the session axis over all visible devices "
                        "(multi-chip serving; zero inter-chip traffic). "
                        "No-op on a single device")
    p.add_argument("--replay", action="store_true",
                   help="offline replay: process the whole recording as ONE "
                        "device dispatch (lax.scan tick chain) instead of "
                        "simulating real-time ticks — identical outputs, "
                        "pays the host round trip once per recording")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 tick compute (params stay f32; with "
                        "--fused_encoder the weight folds are bf16 too — "
                        "half the per-tick HBM weight streaming)")
    p.add_argument("--fused_encoder", action="store_true",
                   help="single-session ticks run the whole encoder+"
                        "similarity as ONE Pallas kernel (weights stream "
                        "HBM→VMEM once per tick; ops/pallas_ops.py §2); "
                        "with --sessions S --replay the whole multi-session "
                        "chain runs as the batched §4 kernel (shared "
                        "weights + per-session BN affines)")
    p.add_argument("--no_fused_encoder", action="store_true",
                   help="force the vmapped XLA encoder path OFF-switch: "
                        "overrides the TPU auto-default (fused ON within "
                        "the VMEM budget) — the escape hatch for a "
                        "deployment geometry that hits a Mosaic/VMEM issue "
                        "the auto gate's estimate misses")
    p.add_argument("--quiet", action="store_true")
    add_platform_flag(p)
    return p


def _load_recording(path: str):
    import numpy as np

    if path.endswith(".npz"):
        with np.load(path) as z:
            return np.asarray(z["emg"], np.float32)
    return np.asarray(np.load(path), np.float32)


def _template_state(model, cfg):
    from contrastiveprosthetics_tpu.train.checkpoint import template_state

    return template_state(model, cfg)


def main(argv=None):
    args = build_parser().parse_args(argv)
    select_platform(args.platform)

    from contrastiveprosthetics_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG as cfg
    from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
    from contrastiveprosthetics_tpu.serve.stream import (
        BatchedStreamingEngine,
        StreamingEngine,
    )
    from contrastiveprosthetics_tpu.train.checkpoint import load_checkpoint

    import jax.numpy as jnp

    model = ContrastiveModel(
        d_e=args.d_e, adabn=False, n_classes=cfg.max_tasks,
        emg_dim=cfg.emg_dim, glove_dim=cfg.glove_dim,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    state = _template_state(model, cfg)
    if args.checkpoint:
        state = load_checkpoint(args.checkpoint, state)
    elif not args.demo:
        print("warning: no --checkpoint given — using fresh-init weights")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    mean_p = os.path.join(args.data_dir, "emg_mean.npy")
    std_p = os.path.join(args.data_dir, "emg_std.npy")
    if os.path.exists(mean_p) and os.path.exists(std_p):
        emg_mean = np.load(mean_p).astype(np.float32)
        emg_std = np.load(std_p).astype(np.float32)
        # the compat 'complete' stats ship a scalar mean (utils.py:104-117)
        emg_mean = np.broadcast_to(emg_mean, (cfg.emg_dim,)).copy()
        emg_std = np.broadcast_to(emg_std, (cfg.emg_dim,)).copy()
    else:
        if not args.demo:
            print(f"warning: no ingest stats under {args.data_dir} — "
                  f"using identity normalization")
        emg_mean = np.zeros(cfg.emg_dim, np.float32)
        emg_std = np.ones(cfg.emg_dim, np.float32)

    S = args.sessions
    if args.recording:
        raw = _load_recording(args.recording)
    elif args.demo:
        rng = np.random.default_rng(0)
        n = int(args.seconds * cfg.hz)
        raw = rng.standard_normal((n, cfg.emg_dim)).astype(np.float32)
    else:
        raise SystemExit("need --recording FILE (or --demo)")
    if raw.ndim == 2:
        raw = np.broadcast_to(raw, (S,) + raw.shape)
    if raw.shape[0] != S:
        raise SystemExit(
            f"recording has {raw.shape[0]} sessions, --sessions={S}"
        )

    subset_mask = None
    if args.subset:
        ids = [int(x) for x in args.subset.split(",")]
        bad = [i for i in ids if not 0 <= i < cfg.max_tasks]
        if bad:
            raise SystemExit(
                f"--subset ids must be in [0, {cfg.max_tasks}), got {bad}"
            )
        subset_mask = np.zeros(cfg.max_tasks, dtype=bool)
        subset_mask[ids] = True

    calib = _load_recording(args.calibrate) if args.calibrate else None
    n_blocks = raw.shape[1] // cfg.factor
    if n_blocks < 1:
        raise SystemExit(
            f"recording has {raw.shape[1]} samples — shorter than one "
            f"{cfg.factor}-sample tick"
        )

    if args.fused_encoder and args.no_fused_encoder:
        raise SystemExit(
            "--fused_encoder and --no_fused_encoder are mutually exclusive"
        )

    if S == 1:
        # tri-state: --fused_encoder forces ON, --no_fused_encoder forces
        # OFF, absent → None = auto (fused on TPU, per the recorded v5e
        # A/B — see StreamingEngine docstring)
        engine = StreamingEngine(
            cfg, model, variables, emg_mean, emg_std,
            use_fused_encoder=(
                True if args.fused_encoder
                else False if args.no_fused_encoder else None
            ),
        )
        if calib is not None:
            if calib.ndim == 3:  # (sessions, samples, ch) file
                if calib.shape[0] != 1:
                    raise SystemExit(
                        f"--calibrate has {calib.shape[0]} sessions; "
                        f"--sessions=1 needs exactly one"
                    )
                calib = calib[0]
            engine.calibrate(calib)
            print("calibrated BN statistics from "
                  f"{args.calibrate or 'recording'}")
        carry = engine.init_carry()
        lat = []
        if args.replay:
            blocks = np.ascontiguousarray(
                raw[0, : n_blocks * cfg.factor]
            ).reshape(n_blocks, cfg.factor, -1)
            t0 = time.perf_counter()
            _, p, v = engine.steps(carry, blocks, subset_mask)
            votes = np.asarray(v)[None]
            lat.append(time.perf_counter() - t0)
            preds = np.asarray(p)[None]
        else:
            preds = np.empty((1, n_blocks), np.int32)
            votes = np.empty((1, n_blocks), np.int32)
            for i in range(n_blocks):
                block = raw[0, i * cfg.factor:(i + 1) * cfg.factor]
                t0 = time.perf_counter()
                carry, p, v, _ = engine.step(carry, block, subset_mask)
                votes[0, i] = int(v)   # blocks until the result is host-side
                lat.append(time.perf_counter() - t0)
                preds[0, i] = int(p)
    else:
        import jax

        mesh = None
        if args.spmd and len(jax.devices()) > 1 and S % len(jax.devices()) == 0:
            from contrastiveprosthetics_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(n_dp=len(jax.devices()), n_mp=1)
            print(f"sessions sharded over {mesh}")
        fused_b = args.fused_encoder and args.replay
        if fused_b and mesh is not None:
            print("--fused_encoder under --spmd: each chip runs the fused "
                  "chain on its session shard (shard_map over dp)")
        if args.fused_encoder and not args.replay:
            # don't build (or VMEM-check) the fused engine for a path that
            # never uses it — per-tick steps stay on the XLA tick
            print("--fused_encoder on the batched engine accelerates the "
                  "--replay chain only; ignoring for per-tick streaming")
        engine = BatchedStreamingEngine(
            cfg, model, variables, emg_mean, emg_std, n_sessions=S,
            mesh=mesh,
            # tri-state (replay only): --fused_encoder forces ON,
            # --no_fused_encoder forces OFF, absent → None = auto (fused on
            # single-chip TPU within the VMEM budget, per the recorded A/B)
            use_fused_encoder=True if fused_b else (
                False if (args.no_fused_encoder or not args.replay)
                else None
            ),
        )
        if calib is not None:
            calib = np.broadcast_to(
                calib, (S,) + calib.shape[-2:]
            ) if calib.ndim == 2 else calib
            for s in range(S):
                engine.calibrate_session(s, calib[s])
            print(f"calibrated BN statistics for {S} sessions")
        masks = (
            np.broadcast_to(subset_mask, (S, cfg.max_tasks))
            if subset_mask is not None else None
        )
        carries = engine.init_carries()
        lat = []
        if args.replay:
            seq = np.ascontiguousarray(
                raw[:, : n_blocks * cfg.factor]
            ).reshape(S, n_blocks, cfg.factor, -1)
            seq = np.moveaxis(seq, 0, 1)  # (n_blocks, S, factor, emg)
            t0 = time.perf_counter()
            _, p, v = engine.steps(carries, seq, masks)
            votes = np.asarray(v).T
            lat.append(time.perf_counter() - t0)
            preds = np.asarray(p).T
        else:
            preds = np.empty((S, n_blocks), np.int32)
            votes = np.empty((S, n_blocks), np.int32)
            for i in range(n_blocks):
                blocks = raw[:, i * cfg.factor:(i + 1) * cfg.factor]
                t0 = time.perf_counter()
                carries, p, v, _ = engine.step(carries, blocks, masks)
                votes[:, i] = np.asarray(v)
                lat.append(time.perf_counter() - t0)
                preds[:, i] = np.asarray(p)

    budget = 1000.0 * cfg.factor / cfg.hz
    if args.replay:
        # one dispatch for the whole recording: no per-tick latencies exist.
        # Save total wall time under its own key, NOT lat_ms — a consumer
        # percentiling lat_ms must never mistake whole-recording time
        # (compile included) for a per-tick latency.
        dt = float(lat[0])
        timing = {"replay_total_ms": np.float64(dt * 1e3)}
        print(f"replayed {n_blocks} ticks × {S} session(s) in ONE dispatch: "
              f"{dt*1e3:.1f} ms total (incl. compile on first run), "
              f"{dt/n_blocks*1e6:.1f} µs/tick amortized")
    else:
        lat_ms = np.array(lat[1:]) * 1e3  # drop the compile tick
        timing = {"lat_ms": lat_ms}
        if lat_ms.size:
            print(f"streamed {n_blocks} ticks × {S} session(s): "
                  f"p50 {np.percentile(lat_ms, 50):.3f} ms/tick, "
                  f"p99 {np.percentile(lat_ms, 99):.3f} ms "
                  f"(budget {budget:.0f} ms)")
        else:  # a 1-tick recording has no post-compile latencies
            print(f"streamed {n_blocks} tick × {S} session(s): "
                  f"first tick {lat[0] * 1e3:.3f} ms incl. compile "
                  f"(budget {budget:.0f} ms)")
    for s in range(min(S, 4)):
        final = int(votes[s, -1])
        uniq, cnt = np.unique(votes[s], return_counts=True)
        top = ", ".join(
            f"{int(u)}×{int(c)}"
            for u, c in sorted(zip(uniq, cnt), key=lambda t: -t[1])[:5]
        )
        if not args.quiet:
            print(f"session {s}: final vote class {final}; "
                  f"vote counts: {top}")
    if args.out:
        np.savez(args.out, preds=preds, votes=votes, **timing)
        print(f"saved preds/votes to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
