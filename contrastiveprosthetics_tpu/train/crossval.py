"""Random-search cross-validation (reference ``cross_validate`` +
hyperparameter sampling, ``train.py:140-198``).

The reference trains its 150 random configs strictly sequentially on one
GPU. Every config shares the same tiny compute graph, so here the whole
sweep is **vmapped**: one XLA program trains a stacked axis of configs
simultaneously — params, Adam moments, dropout streams and batch gathers all
carry a leading config axis, and the MXU sees the sweep as one big batched
GEMM. A whole chunk — init → every epoch (``lax.scan``) → final validation,
for all its configs — is ONE dispatch (``engine._sweep_run``): there are no
per-epoch host round-trips, the same single-dispatch treatment
``train_epochs`` gives final runs. ``chunk`` bounds device memory by
splitting the sweep into vmapped groups. This is the single biggest per-chip
speedup over the reference.

Artifacts: ``cross_val_keys.npy`` (n, 7) and ``cross_val_values.npy`` (n, 2),
byte-compatible with the reference's cached sweep (``train.py:157-166``),
including the ``--crossval_load`` reload path.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveprosthetics_tpu.train.engine import Hyper, Trainer
from contrastiveprosthetics_tpu.train.schedules import schedule_factors

# Tuned sweep-chunk width: configs vmapped per dp shard in one dispatch.
# Measured v5e optimum for BOTH RNG impls (chunk-width scan table in
# cross_validate below); tests pin this constant, not the source text.
DEFAULT_SWEEP_CHUNK_PER_DP = 2


def sample_hyperparams(n: int, seed: int = 42) -> Hyper:
    """The reference's sampling distributions (train.py:175-192):
    log-uniform lr ∈ [1e-6, 1e-1], reg ∈ [1e-9, 1e-1]; dropout U(.4,.6) for
    EMG, U(0,.9) for glove. Returns a Hyper of stacked arrays (n,)."""
    rng = np.random.default_rng(seed)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return Hyper(
        lr_emg=f32(10 ** rng.uniform(-6, -1, n)),
        reg_emg=f32(10 ** rng.uniform(-9, -1, n)),
        dp_emg=f32(rng.uniform(0.4, 0.6, n)),
        lr_glove=f32(10 ** rng.uniform(-6, -1, n)),
        reg_glove=f32(10 ** rng.uniform(-9, -1, n)),
        dp_glove=f32(rng.uniform(0.0, 0.9, n)),
    )


def keys_array(hypers: Hyper, d_e: int) -> np.ndarray:
    """(n, 7) in the reference's column order:
    (d_e, lr_emg, reg_emg, dp_emg, lr_glove, reg_glove, dp_glove)."""
    cols = [
        np.full(len(hypers.lr_emg), d_e, dtype=np.float64),
        np.asarray(hypers.lr_emg, np.float64),
        np.asarray(hypers.reg_emg, np.float64),
        np.asarray(hypers.dp_emg, np.float64),
        np.asarray(hypers.lr_glove, np.float64),
        np.asarray(hypers.reg_glove, np.float64),
        np.asarray(hypers.dp_glove, np.float64),
    ]
    return np.stack(cols, axis=1)


def hyper_from_key(key_row: np.ndarray) -> tuple[int, Hyper]:
    """Inverse of ``keys_array`` for one row (train.py:201-211)."""
    d_e, lr_e, reg_e, dp_e, lr_g, reg_g, dp_g = [float(x) for x in key_row]
    return int(d_e), Hyper.single(lr_e, reg_e, dp_e, lr_g, reg_g, dp_g)


def resolve_chunk(n: int, n_dp: int) -> int:
    """Default sweep-chunk width: ``DEFAULT_SWEEP_CHUNK_PER_DP`` configs
    per dp shard, capped at the number of configs (chunk-width scan table
    in ``cross_validate``)."""
    return min(n, DEFAULT_SWEEP_CHUNK_PER_DP * n_dp)


def cross_validate(
    trainer: Trainer,
    hypers: Hyper,
    epochs: int,
    key: jax.Array,
    chunk: Optional[int] = None,
    save_dir: Optional[str] = None,
    verbose: bool = True,
    id_: str = "",
    mesh=None,
) -> np.ndarray:
    """Train all configs (vmapped, in chunks) and return values (n, 2) =
    (val_loss, val_acc) per config.

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``dp`` axis — the config
    axis is then sharded over it (``parallel/spmd.py`` shard_map path), each
    device training its own slice of configs with zero inter-chip traffic:
    the natural multi-chip scale-out for this workload (SURVEY §5). Chunks
    are padded up to a multiple of the ``dp`` size (pad rows repeat the
    first config; their results are discarded).

    RNG impls under ``mesh``: typed rbg keys (the TPU ``--prng_impl auto``
    default) are validated through this shard_map path on TPU hardware
    (compile+run 75 s, finite results, 2026-08-18). On the XLA:CPU virtual
    8-device mesh the same rbg program did not finish compiling within
    40 min (a CPU-only pathology, same family as the partitioner notes in
    CLAUDE.md) — CPU tests therefore pin the sharded path with threefry
    keys, which ``auto`` also resolves to on CPU."""
    # Loss-impl note: the fused Pallas loss is A/B-neutral at sweep
    # geometry (phase-isolated v5e bench sweep_ab: 1.3728M pallas vs
    # 1.3728M xla windows/s — the sweep is HBM/optimizer-bound, the loss
    # is noise either way), so the trainer's use_pallas_loss setting is
    # honored as-is. An earlier same-process measurement showing pallas
    # 2.7× behind was a cross-program contamination artifact (see
    # bench.py's phase-isolation rationale).
    n = len(np.asarray(hypers.lr_emg))
    if n < 1:
        raise ValueError(
            "cross_validate needs at least one config (the CLI maps "
            "--crossval_size 0 to the canonical hyperparameters instead)"
        )
    n_dp = 1 if mesh is None else mesh.shape["dp"]
    if chunk is None:
        chunk = resolve_chunk(n, n_dp)
        # Chunk-size scans on v5e (bs 8, aggregate over 150 configs). The
        # round-2 scan started at width 5 (f32 threefry: 5 → 2.43M
        # windows/s, 10 → 2.05M, 25 → 1.70M, 50 → 1.48M, 150 → 1.37M) and
        # never looked below it; scanning the narrow end (rbg default,
        # three measurements in two fresh processes, width-5 control
        # reproducing its fresh value exactly) found the true optimum:
        #   chunk   1: 3.31M windows/s   (150 dispatches pay latency)
        #   chunk   2: 3.96-4.01M        <- optimum, beats single-run 3.54M
        #   chunk   3: 3.55M
        #   chunk   4: 3.24M
        #   chunk   5: 2.93M
        #   chunk  10: 2.02M ... chunk 50: 1.51M
        # Width 2 wins for BOTH RNG impls (isolated bench sweep_ab:
        # threefry 3.62M at width 2 vs 2.33M at width 5; rbg 3.97M vs
        # 2.93M): narrow chunks stay in the latency-bound per-step regime
        # while wide vmaps saturate HBM on optimizer/weight traffic (the
        # reference's bs=8 Adam-step-per-batch semantics); width 2
        # balances that against per-chunk dispatch overhead. Default: 2
        # configs per device — each device's shard_map slice runs the
        # measured-optimal width.
    emg_f, glove_f = schedule_factors(
        epochs, annealing=False,
        compat_shared_steplr=trainer.cfg.compat_shared_steplr,
    )
    f_e = jnp.asarray(emg_f, jnp.float32)
    f_g = jnp.asarray(glove_f, jnp.float32)

    hy_np = [np.asarray(x) for x in hypers]
    values = np.empty((n, 2), dtype=np.float64)

    if mesh is None:
        # One jitted chunk program (engine._sweep_chunk_at), one dispatch
        # per chunk with the chunk index as a traced scalar: the chunk
        # table lives on device, keys/init happen in-graph, and NO
        # host→device transfer or sync occurs inside the loop — the chunk
        # dispatches pipeline back to back (v5e: 150 ms/chunk at width 5;
        # host-staged and lax.scan-fused formulations both ran ~350
        # ms/chunk — see _sweep_chunk_at's design history).
        n_chunks = (n + chunk - 1) // chunk
        rows = np.empty((n_chunks, chunk), np.int64)
        for ci in range(n_chunks):
            s, e = ci * chunk, min((ci + 1) * chunk, n)
            # pad rows repeat the chunk's first config; results discarded
            rows[ci] = np.concatenate(
                [np.arange(s, e), np.full(chunk - (e - s), s)]
            )
        h_chunks = Hyper(*[jnp.asarray(a[rows]) for a in hy_np])
        outs = [
            trainer.sweep_chunk_at(
                h_chunks, jnp.int32(ci), key, f_e, f_g,
                trainer.batch_size, chunk,
            )
            for ci in range(n_chunks)
        ]
        vls = np.asarray(
            jnp.concatenate([o[0] for o in outs]), np.float64
        )
        vas = np.asarray(
            jnp.concatenate([o[1] for o in outs]), np.float64
        )
        for ci in range(n_chunks):
            s, e = ci * chunk, min((ci + 1) * chunk, n)
            values[s:e, 0] = vls[ci * chunk: ci * chunk + (e - s)]
            values[s:e, 1] = vas[ci * chunk: ci * chunk + (e - s)]
        if verbose:
            print(
                f"crossval [{n}/{n}]: best acc "
                f"{np.nanmax(values[:, 1]):.4f}"
            )
    else:
        from contrastiveprosthetics_tpu.parallel.spmd import (
            make_sharded_crossval_run,
        )

        run_fn, place = make_sharded_crossval_run(
            trainer, mesh, trainer.batch_size
        )
        vmapped_init = jax.jit(jax.vmap(trainer.init_state))
        pending = []  # deferred syncs so chunk dispatches pipeline
        for start in range(0, n, chunk):
            sl = slice(start, min(start + chunk, n))
            m = sl.stop - sl.start
            pad = (-m) % n_dp  # shard_map needs the axis divisible by dp
            rows = np.arange(sl.start, sl.stop)
            if pad:
                rows = np.concatenate([rows, np.full(pad, sl.start)])
            h = Hyper(*[jnp.asarray(a[rows]) for a in hy_np])
            k_chunk = jax.random.fold_in(key, start)
            init_keys = jax.random.split(
                jax.random.fold_in(k_chunk, 0), m + pad
            )
            states = place(vmapped_init(init_keys))
            # per-config per-epoch keys, (m+pad, epochs, 2) — the same key
            # chain the per-epoch host loop used, batched up front
            ep_keys = jnp.stack(
                [
                    jax.random.split(
                        jax.random.fold_in(k_chunk, 100 + e), m + pad
                    )
                    for e in range(epochs)
                ],
                axis=1,
            )
            val_keys = jax.random.split(
                jax.random.fold_in(k_chunk, 999), m + pad
            )
            vl, va = run_fn(states, ep_keys, val_keys, h, f_e, f_g)
            pending.append((sl, m, vl, va))
        for sl, m, vl, va in pending:
            values[sl, 0] = np.asarray(vl, np.float64)[:m]
            values[sl, 1] = np.asarray(va, np.float64)[:m]
        if verbose:
            print(
                f"crossval [{n}/{n}]: best acc "
                f"{np.nanmax(values[:, 1]):.4f}"
            )

    if save_dir is not None:
        # id_ parameterizes the cache filenames exactly like the reference's
        # cross_validate(..., id_) (train.py:140,159-165 — the shipped
        # cross_val_keys_finetune.npy came from id_="_finetune")
        os.makedirs(save_dir, exist_ok=True)
        np.save(os.path.join(save_dir, f"cross_val_values{id_}.npy"), values)
        np.save(
            os.path.join(save_dir, f"cross_val_keys{id_}.npy"),
            keys_array(hypers, trainer.d_e),
        )
    return values


def load_crossval(save_dir: str, id_: str = "") -> tuple[np.ndarray, np.ndarray]:
    """--crossval_load path (train.py:162-166)."""
    values = np.load(os.path.join(save_dir, f"cross_val_values{id_}.npy"))
    keys = np.load(os.path.join(save_dir, f"cross_val_keys{id_}.npy"))
    return values, keys


def best_config(values: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """nanargmax on val accuracy (train.py:196-198)."""
    return keys[int(np.nanargmax(values[:, 1]))]
