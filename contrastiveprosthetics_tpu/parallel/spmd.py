"""SPMD training over a device mesh.

Two production paths:

  * ``make_sharded_train_step`` — a full dp×mp-sharded optimization step:
    batch split over ``dp`` (gradients psum'd by XLA), the 512-wide MLP
    kernels megatron-sharded over ``mp``. One jitted program; GSPMD places
    the collectives on ICI.
  * ``make_sharded_crossval_epoch`` — the crossval sweep's config axis
    sharded over ``dp``: each chip trains its own slice of configs with no
    communication (the ideal scaling for this workload; SURVEY §5).
"""
from __future__ import annotations

import jax

from jax.sharding import NamedSharding, PartitionSpec as P

from contrastiveprosthetics_tpu.parallel.mesh import (
    batch_sharding,
    replicated,
    state_shardings,
)
from contrastiveprosthetics_tpu.train.engine import Trainer


def make_sharded_train_step(trainer: Trainer, mesh):
    """Returns (step_fn, place_state): ``step_fn(state, emg_b, glove_b,
    hyper, lr_e, lr_g, key)`` jitted with dp-sharded batch and mp-sharded
    params."""
    st_template = jax.eval_shape(
        trainer.init_state, jax.random.PRNGKey(0)
    )
    st_sh = state_shardings(mesh, st_template)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    step = jax.jit(
        trainer._sgd_step,
        in_shardings=(st_sh, bsh, bsh, rep, rep, rep, rep),
        out_shardings=(st_sh, rep, rep),
    )

    def place_state(state):
        return jax.device_put(state, st_sh)

    return step, place_state


def make_sharded_crossval_step(trainer: Trainer, mesh):
    """Config-sharded single optimization step: ``step(states, emg_b,
    glove_b, hypers, lr_e, lr_g, keys)`` with the leading config axis of
    states/batches/hypers/keys sharded over ``dp``. The cheap-to-compile
    demonstration of the crossval scale-out (the full sharded epoch lives in
    ``make_sharded_crossval_epoch``)."""

    def cfg_sharding_for(tree):
        return jax.tree_util.tree_map(
            lambda leaf: NamedSharding(
                mesh, P(*(("dp",) + (None,) * (max(leaf.ndim, 1) - 1)))
            ),
            tree,
        )

    vmapped = jax.vmap(trainer._sgd_step, in_axes=(0, 0, 0, 0, None, None, 0))

    def step(states, emg_b, glove_b, hypers, lr_e, lr_g, keys):
        st_sh = cfg_sharding_for(states)
        rep = replicated(mesh)
        fn = jax.jit(
            vmapped,
            in_shardings=(
                st_sh,
                cfg_sharding_for(emg_b),
                cfg_sharding_for(glove_b),
                cfg_sharding_for(hypers),
                rep,
                rep,
                cfg_sharding_for(keys),
            ),
            out_shardings=(st_sh, NamedSharding(mesh, P("dp")),
                           NamedSharding(mesh, P("dp"))),
        )
        return fn(states, emg_b, glove_b, hypers, lr_e, lr_g, keys)

    return step


def make_sharded_crossval_epoch(trainer: Trainer, mesh):
    """Returns (epoch_fn, place): ``epoch_fn(states, keys, hypers, f_e,
    f_g)`` with the leading config axis of every argument sharded over
    ``dp``. Each device trains its config slice independently.

    Implemented with ``shard_map`` rather than GSPMD ``in_shardings`` over a
    vmapped epoch: the config axis is embarrassingly parallel (zero
    collectives), so per-shard tracing is exact — and it sidesteps the SPMD
    partitioner, whose pass over a vmapped scan-of-train-step program is a
    multi-hour XLA:CPU compile (measured on the 8-virtual-device test mesh;
    the partitioned HLO is identical in effect). Inside each shard the
    config slice is still vmapped, so the MXU sees batched GEMMs."""
    from jax import shard_map

    def cfg_sharding_for(tree):
        return jax.tree_util.tree_map(
            lambda leaf: NamedSharding(
                mesh, P(*(("dp",) + (None,) * (leaf.ndim - 1)))
            ),
            tree,
        )

    vmapped = jax.vmap(trainer._train_epoch, in_axes=(0, 0, 0, None, None))

    cfg_spec = P("dp")
    rep_spec = P()

    def spec_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    # the jitted wrapper is built ONCE (on first call, when the arg pytree
    # structures are known) and reused — a fresh jax.jit per call would
    # carry a fresh trace cache and re-trace the whole epoch program on
    # every invocation
    cache = {}

    def epoch_fn(states, keys, hypers, f_e, f_g):
        if "fn" not in cache:
            cache["fn"] = jax.jit(
                shard_map(
                    vmapped,
                    mesh=mesh,
                    in_specs=(
                        spec_like(states, cfg_spec),
                        cfg_spec,
                        spec_like(hypers, cfg_spec),
                        rep_spec,
                        rep_spec,
                    ),
                    out_specs=(spec_like(states, cfg_spec), cfg_spec, cfg_spec),
                    check_vma=False,
                )
            )
        return cache["fn"](states, keys, hypers, f_e, f_g)

    def place(tree):
        return jax.device_put(tree, cfg_sharding_for(tree))

    return epoch_fn, place


def make_sharded_crossval_eval(trainer: Trainer, mesh, batch_size: int):
    """Config-sharded metrics-only validation: ``eval_fn(states, keys,
    hypers) -> (losses, accs)`` with the config axis over ``dp``. Same
    shard_map formulation (and rationale) as the sharded epoch."""
    from jax import shard_map

    vmapped = jax.vmap(
        lambda s, k, h: trainer._evaluate_scalars(s, k, h, "val", batch_size),
        in_axes=(0, 0, 0),
    )
    cfg_spec = P("dp")

    def spec_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    cache = {}  # build the jitted wrapper once — see make_sharded_crossval_epoch

    def eval_fn(states, keys, hypers):
        if "fn" not in cache:
            cache["fn"] = jax.jit(
                shard_map(
                    vmapped,
                    mesh=mesh,
                    in_specs=(
                        spec_like(states, cfg_spec),
                        cfg_spec,
                        spec_like(hypers, cfg_spec),
                    ),
                    out_specs=(cfg_spec, cfg_spec),
                    check_vma=False,
                )
            )
        return cache["fn"](states, keys, hypers)

    return eval_fn
