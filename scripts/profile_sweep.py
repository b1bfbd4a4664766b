"""Profile the vmapped crossval sweep on TPU: where does the time go?

Two layers of evidence:
  1. Sweep ablations (full / no_eval / half_cfg) — each a separate compile,
     timed steady-state.
  2. Component microbenches replaying ONE cost dimension of the sweep at
     exact sweep volume for 225 scan steps: dropout-RNG mask generation,
     the 2×Adam parameter update, the per-step batch gathers. Each is a
     small program that compiles in seconds and bounds that component's
     share of the sweep wall time.
"""
from __future__ import annotations

import sys
import time

from contrastiveprosthetics_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG as cfg
from contrastiveprosthetics_tpu.data.store import DeviceStore
from contrastiveprosthetics_tpu.data.synthetic import make_processed_dataset
from contrastiveprosthetics_tpu.train.crossval import sample_hyperparams
from contrastiveprosthetics_tpu.train.engine import Hyper, Trainer

N_CFG, EPOCHS, BS = 150, 1, 8


def bench(fn, *args, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{label:18s} {dt:7.3f}s", file=sys.stderr, flush=True)
    return dt


def time_sweep(trainer, hypers, with_eval=True, label=""):
    n = len(np.asarray(hypers.lr_emg))
    key = jax.random.PRNGKey(0)
    init_keys = jax.random.split(jax.random.fold_in(key, 0), n)
    states = jax.jit(jax.vmap(trainer.init_state))(init_keys)
    ep_keys = jnp.stack(
        [jax.random.split(jax.random.fold_in(key, 100 + e), n)
         for e in range(EPOCHS)], axis=1,
    )
    val_keys = jax.random.split(jax.random.fold_in(key, 999), n)
    ones = jnp.ones((EPOCHS,), jnp.float32)
    if with_eval:
        fn = jax.jit(jax.vmap(
            lambda s, ek, vk, h, tv, vv: trainer._sweep_run(
                s, ek, vk, h, ones, ones, tv, vv, trainer.batch_size),
            in_axes=(0, 0, 0, 0, None, None),
        ))
        dt = bench(fn, states, ep_keys, val_keys, hypers,
                   trainer.view_train, trainer.view_val, label=label)
    else:
        fn = jax.jit(jax.vmap(
            lambda s, ek, h, tv: trainer._train_epochs(
                s, ek, h, ones, ones, tv),
            in_axes=(0, 0, 0, None),
        ))
        dt = bench(fn, states, ep_keys, hypers, trainer.view_train,
                   label=label)
    v = trainer.view_train
    wps = n * EPOCHS * v.D * v.n_tasks / dt
    print(f"{'':18s}   → {wps:,.0f} windows/s", file=sys.stderr, flush=True)
    return dt


def main():
    emg, pos, glove = make_processed_dataset(cfg)
    store = DeviceStore(cfg, emg, pos, glove)
    trainer = Trainer(cfg, store, adabn=False, batch_size=BS,
                      use_pallas_loss=False)
    hypers = sample_hyperparams(N_CFG, seed=7)
    v = trainer.view_train
    steps = v.D // BS  # 225

    t_full = time_sweep(trainer, hypers, with_eval=True, label="full")
    t_noeval = time_sweep(trainer, hypers, with_eval=False, label="no_eval")
    time_sweep(trainer, Hyper(*[x[:N_CFG // 2] for x in hypers]),
               with_eval=False, label="half_cfg")
    print(f"eval share ≈ {t_full - t_noeval:.2f}s", file=sys.stderr)

    # ---- component microbenches at exact sweep volume ----
    rows = N_CFG * BS * v.n_tasks  # rows through the MLP per step

    def rng_replay(key):
        def body(c, i):
            k = jax.random.fold_in(key, i)
            masks = [
                jax.random.bernoulli(jax.random.fold_in(k, j), 0.5,
                                     (rows, trainer.hidden))
                for j in range(4)
            ]
            return c + sum(m.sum(dtype=jnp.float32) for m in masks), None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return out

    bench(jax.jit(rng_replay), jax.random.PRNGKey(1),
          label=f"rng 4×({rows}×{trainer.hidden})×{steps}")

    # 2×Adam update over the stacked config axis, replayed `steps` times
    import optax

    opt = optax.scale_by_adam()
    init_keys = jax.random.split(jax.random.PRNGKey(2), N_CFG)
    states = jax.jit(jax.vmap(trainer.init_state))(init_keys)

    def adam_replay(params, opt_state):
        def body(carry, _):
            p, s = carry
            up, s2 = jax.vmap(opt.update)(p, s, p)  # grads := params (dummy)
            p2 = jax.tree_util.tree_map(lambda a, u: a - 1e-3 * u, p, up)
            return (p2, s2), None
        (p, s), _ = jax.lax.scan(body, (params, opt_state), None, length=steps)
        return p

    bench(jax.jit(adam_replay), states.params["emg_net"], states.opt_emg,
          label=f"adam emg×{steps}")

    # per-step batch gathers for all configs
    from contrastiveprosthetics_tpu.data.sampler import (
        epoch_batches,
        gather_train_batch,
        task_permutations,
    )

    def gather_replay(key):
        def one_cfg(k):
            perms = task_permutations(k, v.n_tasks, v.D)
            batches = epoch_batches(jax.random.fold_in(k, 1), v.D, BS)
            def body(c, items):
                b = gather_train_batch(v.emg_flat, perms, items)
                return c + b.sum(), None
            out, _ = jax.lax.scan(body, jnp.float32(0), batches)
            return out
        return jax.vmap(one_cfg)(jax.random.split(key, N_CFG))

    bench(jax.jit(gather_replay), jax.random.PRNGKey(3),
          label=f"gathers×{steps}")


if __name__ == "__main__":
    main()
