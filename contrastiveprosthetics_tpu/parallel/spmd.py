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

    # the train view rides along as a replicated ARGUMENT (in_axes=None,
    # in_specs=P()) — closing over it would bake the split tensor into the
    # HLO as a literal (see engine._train_epoch's note)
    vmapped = jax.vmap(trainer._train_epoch, in_axes=(0, 0, 0, None, None, None))

    cfg_spec = P("dp")
    rep_spec = P()

    def spec_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    # the jitted wrapper is built ONCE per arg-pytree structure and reused —
    # a fresh jax.jit per call would carry a fresh trace cache and re-trace
    # the whole epoch program every invocation. Keyed on tree structure
    # (not a single slot) so a structurally different states/hypers tree
    # (e.g. another trainer reusing this closure) gets its own correctly
    # specced program instead of mis-sharding under check_vma=False.
    cache = {}

    def epoch_fn(states, keys, hypers, f_e, f_g):
        sig = jax.tree_util.tree_structure((states, hypers))
        if sig not in cache:
            cache[sig] = jax.jit(
                shard_map(
                    vmapped,
                    mesh=mesh,
                    in_specs=(
                        spec_like(states, cfg_spec),
                        cfg_spec,
                        spec_like(hypers, cfg_spec),
                        rep_spec,
                        rep_spec,
                        rep_spec,
                    ),
                    out_specs=(spec_like(states, cfg_spec), cfg_spec, cfg_spec),
                    check_vma=False,
                )
            )
        return cache[sig](states, keys, hypers, f_e, f_g, trainer.view_train)

    def place(tree):
        return jax.device_put(tree, cfg_sharding_for(tree))

    return epoch_fn, place


def make_sharded_crossval_run(trainer: Trainer, mesh, val_batch_size: int):
    """Returns (run_fn, place): the WHOLE sweep chunk — init states already
    placed, every epoch, final validation — as one sharded program:
    ``run_fn(states, ep_keys, val_keys, hypers, emg_factors, glove_factors)
    -> (val_losses, val_accs)`` with the leading config axis sharded over
    ``dp``. Same shard_map formulation (and GSPMD-partitioner rationale) as
    ``make_sharded_crossval_epoch``, but one dispatch per chunk instead of
    one per epoch."""
    from jax import shard_map

    def cfg_sharding_for(tree):
        return jax.tree_util.tree_map(
            lambda leaf: NamedSharding(
                mesh, P(*(("dp",) + (None,) * (leaf.ndim - 1)))
            ),
            tree,
        )

    # views ride along as replicated ARGUMENTS — see engine._train_epoch
    vmapped = jax.vmap(
        lambda s, ek, vk, h, fe, fg, tv, vv: trainer._sweep_run(
            s, ek, vk, h, fe, fg, tv, vv, val_batch_size
        ),
        in_axes=(0, 0, 0, 0, None, None, None, None),
    )

    cfg_spec = P("dp")
    rep_spec = P()

    def spec_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    cache = {}  # keyed per pytree structure — see make_sharded_crossval_epoch

    def run_fn(states, ep_keys, val_keys, hypers, f_e, f_g):
        sig = jax.tree_util.tree_structure((states, hypers))
        if sig not in cache:
            cache[sig] = jax.jit(
                shard_map(
                    vmapped,
                    mesh=mesh,
                    in_specs=(
                        spec_like(states, cfg_spec),
                        cfg_spec,
                        cfg_spec,
                        spec_like(hypers, cfg_spec),
                        rep_spec,
                        rep_spec,
                        rep_spec,
                        rep_spec,
                    ),
                    out_specs=(cfg_spec, cfg_spec),
                    check_vma=False,
                )
            )
        return cache[sig](
            states, ep_keys, val_keys, hypers, f_e, f_g,
            trainer.view_train, trainer.view_val,
        )

    def place(tree):
        return jax.device_put(tree, cfg_sharding_for(tree))

    return run_fn, place


def make_sharded_crossval_eval(trainer: Trainer, mesh, batch_size: int):
    """Config-sharded metrics-only validation: ``eval_fn(states, keys,
    hypers) -> (losses, accs)`` with the config axis over ``dp``. Same
    shard_map formulation (and rationale) as the sharded epoch."""
    from jax import shard_map

    # the val view rides along as a replicated ARGUMENT — see
    # engine._train_epoch
    vmapped = jax.vmap(
        lambda s, k, h, vv: trainer._evaluate_scalars(s, k, h, vv, batch_size),
        in_axes=(0, 0, 0, None),
    )
    cfg_spec = P("dp")
    rep_spec = P()

    def spec_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    # keyed per pytree structure — see make_sharded_crossval_epoch
    cache = {}

    def eval_fn(states, keys, hypers):
        sig = jax.tree_util.tree_structure((states, hypers))
        if sig not in cache:
            cache[sig] = jax.jit(
                shard_map(
                    vmapped,
                    mesh=mesh,
                    in_specs=(
                        spec_like(states, cfg_spec),
                        cfg_spec,
                        spec_like(hypers, cfg_spec),
                        rep_spec,
                    ),
                    out_specs=(cfg_spec, cfg_spec),
                    check_vma=False,
                )
            )
        return cache[sig](states, keys, hypers, trainer.view_val)

    return eval_fn
