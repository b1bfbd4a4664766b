"""Benchmark harness — prints ONE JSON line.

Primary metric: **sEMG training windows/sec/chip** on the canonical DB23
workload (the BASELINE.json north-star metric): the go.sh configuration —
DB3 view (6 amputee subjects), batch_size 8, contrastive model, plain BN —
on synthetic data with the exact DB23 geometry (the reference holds the same
54 MB tensor; contents don't affect throughput).

One training epoch = D·n_tasks = 1800·41 = 73,800 single-frame windows
through the full gather→forward→loss→backward→2×Adam pipeline.

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md: "published: {}"), so the denominator is a documented estimate
of the reference implementation's ceiling: its Python-level per-item CE loop
(models.py:146), per-prefix ``torch.mode`` voting loop and DataLoader-driven
single-frame gathers bound it to ~10 s/epoch on its 12 GB GPU ⇒ ~7,380
windows/s. vs_baseline = measured / 7,380 (≥10 ⇒ the BASELINE.md target).

A *measured* (not estimated) baseline also exists: BASELINE_MEASURED.json,
produced by scripts/measure_reference_baseline.py running the reference's
own train-loop body on CPU torch. When present, its windows/s and the
corresponding speedup are reported as extra keys
(``baseline_measured_cpu_wps``, ``vs_baseline_measured_cpu``) — clearly
labeled CPU, since this image has no CUDA torch.

Extra metrics (stderr, not the JSON contract): eval windows/s and p50
per-tick streaming-inference latency.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_BASELINE_WPS = 7380.0


def main():
    # persistent compile cache, repo-local (gitignored): TPU epoch/GSPMD
    # compiles go through a remote compile service and take 1-15 min cold
    from contrastiveprosthetics_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # .jax_cache_tpu / _cpu by active backend

    import jax
    import jax.numpy as jnp

    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG as cfg
    from contrastiveprosthetics_tpu.data.store import DeviceStore
    from contrastiveprosthetics_tpu.data.synthetic import make_processed_dataset
    from contrastiveprosthetics_tpu.train.engine import Hyper, Trainer

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # --- p50 streaming-inference latency per 10 ms tick ---
    # Measured FIRST: on remote-attached TPUs, running large programs first
    # degrades subsequent small-dispatch latency ~40× (allocator/dispatch
    # state), which would misattribute ~29 ms to a 0.7 ms path. Latency is
    # weight-value independent, so fresh-init params are representative.
    try:
        from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
        from contrastiveprosthetics_tpu.serve.stream import StreamingEngine

        model = ContrastiveModel(d_e=16, adabn=False, n_classes=cfg.max_tasks)
        key0 = jax.random.PRNGKey(0)
        import jax.numpy as jnp

        variables = model.init(
            {"params": key0, "dropout": key0},
            jnp.zeros((2, cfg.max_tasks, cfg.emg_dim)),
            jnp.zeros((2, cfg.max_tasks, cfg.glove_dim)),
            0.5, 0.5, True,
        )
        engine = StreamingEngine(
            cfg, model, variables,
            emg_mean=np.zeros(cfg.emg_dim, np.float32),
            emg_std=np.ones(cfg.emg_dim, np.float32),
        )
        carry = engine.init_carry()
        block = np.random.default_rng(0).standard_normal(
            (cfg.factor, cfg.emg_dim)
        ).astype(np.float32)
        carry, p, vvote, _ = engine.step(carry, block)  # compile
        jax.block_until_ready(p)
        lat = []
        for _ in range(200):
            t0 = time.perf_counter()
            carry, p, vvote, _ = engine.step(carry, block)
            jax.block_until_ready(p)
            lat.append(time.perf_counter() - t0)
        p50 = float(np.percentile(lat, 50) * 1e3)
        print(f"serve: p50 per-tick latency {p50:.3f} ms "
              f"(budget 10 ms/tick)", file=sys.stderr)
    except Exception as e:
        print(f"serve bench skipped: {e}", file=sys.stderr)

    # multi-session serving: one vmapped tick for S users per chip.
    # Own try-block: a regression here must not be masked by (or mask) the
    # single-session serve bench.
    try:
        from contrastiveprosthetics_tpu.serve.stream import (
            BatchedStreamingEngine,
        )

        S = 64
        batched = BatchedStreamingEngine(
            cfg, model, variables,
            emg_mean=np.zeros(cfg.emg_dim, np.float32),
            emg_std=np.ones(cfg.emg_dim, np.float32),
            n_sessions=S,
        )
        carries = batched.init_carries()
        blocks = np.random.default_rng(1).standard_normal(
            (S, cfg.factor, cfg.emg_dim)
        ).astype(np.float32)
        carries, p, v, _ = batched.step(carries, blocks)  # compile
        jax.block_until_ready(p)
        lat = []
        for _ in range(100):
            t0 = time.perf_counter()
            carries, p, v, _ = batched.step(carries, blocks)
            jax.block_until_ready(p)
            lat.append(time.perf_counter() - t0)
        p50b = float(np.percentile(lat, 50) * 1e3)
        cap = int(S * 10.0 / p50b)  # sessions serveable inside the budget
        print(
            f"serve: {S} concurrent sessions p50 {p50b:.3f} ms/tick "
            f"({p50b / S * 1e3:.1f} µs/session; ~{cap:,} sessions/chip at "
            f"the 10 ms budget)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"multi-session serve bench skipped: {e}", file=sys.stderr)

    emg, pos, glove = make_processed_dataset(cfg)  # full 46-person geometry
    store = DeviceStore(cfg, emg, pos, glove, device=dev)
    trainer = Trainer(cfg, store, adabn=False, batch_size=8)
    hyper = Hyper.single(1e-3, 1e-6, 0.5, 1e-3, 1e-6, 0.3)

    key = jax.random.PRNGKey(0)
    state = trainer.init_state(key)
    v = trainer.view_train
    windows_per_epoch = v.D * v.n_tasks

    # --- crossval sweep throughput (the vmapped 150-config random search,
    # one dispatch per chunk — train/crossval.py). Measured BEFORE the
    # train/eval benches: running it after other large programs in the
    # same process depressed it to 807k w/s vs the 1.37M a fresh process
    # reaches (allocator/dispatch interference; scripts/profile_sweep.py
    # reproduces the fresh-process number). A/B the fused Pallas
    # loss at SWEEP geometry (N = configs × batch items), where skipping
    # the HBM logits round-trip matters most (VERDICT r1 #4). ---
    sweep_out = {}
    try:
        from contrastiveprosthetics_tpu.train.crossval import (
            sample_hyperparams,
        )

        on_tpu = jax.default_backend() == "tpu"
        n_cfg = 150 if on_tpu else 4   # CPU: smoke-scale only
        sweep_epochs = 1
        hypers = sample_hyperparams(n_cfg, seed=7)
        sweep_windows = n_cfg * sweep_epochs * v.D * v.n_tasks
        skey = jax.random.fold_in(key, 7)
        init_keys = jax.random.split(jax.random.fold_in(skey, 0), n_cfg)
        ep_keys = jnp.stack(
            [jax.random.split(jax.random.fold_in(skey, 100 + e), n_cfg)
             for e in range(sweep_epochs)], axis=1,
        )
        val_keys = jax.random.split(jax.random.fold_in(skey, 999), n_cfg)
        sweep_ones = np.ones(sweep_epochs, np.float32)
        ab = {}
        # drive trainer._sweep_run directly (cross_validate itself forces
        # the XLA loss — the point of this A/B is to keep measuring why)
        # xla-f32 (the production sweep default) timed first, in the
        # cleanest process state; then the bf16 and pallas A/B records
        # (bf16 wins at sweep geometry — the program is HBM-bound and
        # halving activation bytes pays; it remains opt-in via --bf16
        # because the reference trains f32)
        variants = [
            ("xla", dict(use_pallas_loss=False)),
            ("bf16", dict(use_pallas_loss=False,
                          compute_dtype="bfloat16")),
            ("pallas", dict(use_pallas_loss=True)),
        ]
        for label, kw in variants:
            if label != "xla" and not on_tpu:
                continue
            tr_s = Trainer(cfg, store, adabn=False, batch_size=8, **kw)
            run = jax.jit(jax.vmap(
                lambda s, ek, vk, h: tr_s._sweep_run(
                    s, ek, vk, h, sweep_ones, sweep_ones, tr_s.batch_size),
                in_axes=(0, 0, 0, 0),
            ))
            states = jax.jit(jax.vmap(tr_s.init_state))(init_keys)
            out = run(states, ep_keys, val_keys, hypers)   # compile + warm
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = run(states, ep_keys, val_keys, hypers)   # steady state
            jax.block_until_ready(out)
            ab[label] = sweep_windows / (time.perf_counter() - t0)
            print(f"sweep[{label}]: {n_cfg} cfgs × {sweep_epochs} ep → "
                  f"{ab[label]:,.0f} windows/s", file=sys.stderr)
        # headline = the production default (f32 XLA loss); the faster
        # opt-in variants are recorded in sweep_ab
        best_label = "xla" if "xla" in ab else max(ab, key=ab.get)
        sweep_wps = ab[best_label]
        sweep_out = {
            "crossval_sweep_windows_per_sec": round(sweep_wps, 1),
            "sweep_configs": n_cfg,
            "sweep_loss_impl": best_label,
            "sweep_ab": {k: round(v_, 1) for k, v_ in ab.items()},
        }
    except Exception as e:
        print(f"sweep bench skipped: {e}", file=sys.stderr)


    # --- warm-up (compile) ---
    n_epochs = 5
    ones = np.ones(n_epochs, np.float32)
    state, losses, _ = trainer.train_epochs(
        state, jax.random.split(jax.random.fold_in(key, 0), n_epochs),
        hyper, ones, ones
    )
    jax.block_until_ready(losses)

    # --- timed: the production multi-epoch path (train_loop verbose=False)
    # — one dispatch for the whole lax.scan-over-epochs program ---
    t0 = time.perf_counter()
    state, losses, _ = trainer.train_epochs(
        state, jax.random.split(jax.random.fold_in(key, 1), n_epochs),
        hyper, ones, ones
    )
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0
    train_wps = n_epochs * windows_per_epoch / dt
    print(
        f"train: {n_epochs} epochs in {dt:.3f}s → {train_wps:,.0f} windows/s "
        f"(single-dispatch epoch scan)",
        file=sys.stderr,
    )

    # --- eval throughput (test view, voting pipeline) ---
    res = trainer.evaluate(state, jax.random.fold_in(key, 99), hyper, split="test")
    jax.block_until_ready(res.loss)
    vt = trainer.view_test
    eval_windows = vt.D * vt.n_tasks * cfg.prediction_window_size
    t0 = time.perf_counter()
    reps = 10
    for i in range(reps):
        res = trainer.evaluate(
            state, jax.random.fold_in(key, 100 + i), hyper, split="test"
        )
    jax.block_until_ready(res.loss)
    eval_wps = reps * eval_windows / (time.perf_counter() - t0)
    print(f"eval: {eval_wps:,.0f} windows/s (voting pipeline)", file=sys.stderr)

    # --- MFU (utils/flops.py): achieved FLOP/s vs the chip's bf16 peak ---
    from contrastiveprosthetics_tpu.utils.flops import (
        emg_forward_flops_per_window,
        mfu,
        peak_flops,
        train_flops_per_window,
    )

    kind = dev.device_kind
    peaks = peak_flops(kind)
    f_fwd = emg_forward_flops_per_window()
    f_train = train_flops_per_window()
    mfu_out = {
        "device_kind": kind,
        "flops_per_window_fwd": f_fwd,
        "flops_per_window_train": f_train,
        "peak_bf16_flops": peaks["bf16"],
        "train_tflops": round(train_wps * f_train / 1e12, 2),
        "mfu_train": round(mfu(train_wps, f_train, kind)["mfu_bf16"], 4),
        "eval_windows_per_sec": round(eval_wps, 1),
        "eval_tflops": round(eval_wps * f_fwd / 1e12, 2),
        "mfu_eval": round(mfu(eval_wps, f_fwd, kind)["mfu_bf16"], 4),
    }
    if sweep_out:
        sweep_wps = sweep_out["crossval_sweep_windows_per_sec"]
        mfu_out["sweep_tflops"] = round(sweep_wps * f_train / 1e12, 2)
        mfu_out["mfu_sweep"] = round(
            mfu(sweep_wps, f_train, kind)["mfu_bf16"], 4
        )
    print(
        f"mfu: train {mfu_out['mfu_train']:.1%} "
        f"({mfu_out['train_tflops']} TFLOP/s), eval {mfu_out['mfu_eval']:.1%}"
        + (f", sweep {mfu_out.get('mfu_sweep', 0):.1%}" if sweep_out else ""),
        file=sys.stderr,
    )

    out = {
        "metric": "semg_train_windows_per_sec_per_chip",
        "value": round(train_wps, 1),
        "unit": "windows/s",
        "vs_baseline": round(train_wps / REFERENCE_BASELINE_WPS, 2),
        **sweep_out,
        **mfu_out,
    }
    try:
        import pathlib

        measured = json.loads(
            (pathlib.Path(__file__).parent / "BASELINE_MEASURED.json")
            .read_text()
        )
        out["baseline_measured_cpu_wps"] = measured["value"]
        out["vs_baseline_measured_cpu"] = round(train_wps / measured["value"], 1)
    except (FileNotFoundError, KeyError, json.JSONDecodeError):
        pass
    print(json.dumps(out))


def main_with_retry():
    """The remote-attached 'axon' TPU occasionally drops its tunnel
    mid-session (observed: jax.errors.JaxRuntimeError FAILED_PRECONDITION,
    recovers within minutes). One bad tick must not corrupt the recorded
    bench, so on failure re-exec once in a FRESH process (the dead backend
    client is cached process-wide) after a cooldown."""
    import os

    try:
        main()
    except RuntimeError as e:
        # Only transient tunnel drops warrant a retry: jax surfaces them as
        # JaxRuntimeError with FAILED_PRECONDITION / UNAVAILABLE status.
        # Deterministic failures (shape errors, OOM, ImportError, assertion)
        # fail fast instead of burning a 120 s sleep + full re-run.
        import jax.errors

        transient = isinstance(e, jax.errors.JaxRuntimeError) and any(
            tag in str(e) for tag in ("FAILED_PRECONDITION", "UNAVAILABLE",
                                      "DEADLINE_EXCEEDED")
        )
        if not transient or os.environ.get("CPTPU_BENCH_RETRY") == "1":
            raise
        print(f"bench attempt failed ({type(e).__name__}: {e}); "
              f"re-executing in 120 s", file=sys.stderr)
        time.sleep(120)
        os.environ["CPTPU_BENCH_RETRY"] = "1"
        # re-exec with the original argv so future flags survive the retry
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    main_with_retry()
