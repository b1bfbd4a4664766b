"""Device meshes and sharding rules.

The reference is strictly single-device (SURVEY §2: no DP/TP/PP anywhere;
the whole dataset fits in accelerator memory). The TPU-native scaling axes
for this workload are:

  * ``cfg`` — the cross-validation sweep: embarrassingly parallel configs
    (the vmapped axis of ``train/crossval.py``) sharded across chips. This
    is the production scale-out: 150 configs over N chips with *zero*
    inter-chip communication until the final metric gather.
  * ``dp``  — batch data-parallel for a single training run: batch sharded,
    params replicated; XLA inserts the gradient ``psum`` over ICI.
  * ``mp``  — tensor-parallel demonstration axis: the 512-wide MLP kernels
    are sharded on their output/input features alternately, giving
    megatron-style column→row parallel pairs whose activations ride ICI.

All sharding is GSPMD-style: we annotate `NamedSharding`s on inputs and let
``jit`` propagate and insert collectives — no manual psum/all_gather.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_dp: Optional[int] = None,
    n_mp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(dp × mp) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_dp is None:
        n_dp = len(devices) // n_mp
    use = n_dp * n_mp
    if use > len(devices):
        raise ValueError(f"need {use} devices, have {len(devices)}")
    arr = np.asarray(devices[:use]).reshape(n_dp, n_mp)
    return Mesh(arr, axis_names=("dp", "mp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across dp."""
    return NamedSharding(mesh, P("dp"))


def config_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (crossval-config) axis across dp."""
    return NamedSharding(mesh, P("dp"))


def _param_spec(path, leaf, hidden: int) -> P:
    """Tensor-parallel rule for the EMG MLP: alternate column/row sharding
    of the (hidden × hidden) kernels so consecutive layers form
    column→row-parallel pairs; everything else replicated."""
    names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
    if names and names[-1] == "kernel" and leaf.ndim == 2:
        d_in, d_out = leaf.shape
        if d_in == hidden and d_out == hidden:
            # alternate by layer index parity. The layer index lives in the
            # *outer* TorchDense_<i> wrapper (each wraps a single Dense_0),
            # so parse that component — parsing Dense_<i> would always see
            # 0 and leave every hidden kernel column-parallel.
            idx = 0
            for n in names:
                if n.startswith("TorchDense_"):
                    idx = int(n.split("_")[1])
            # TorchDense_0 is the 768→512 input projection (column-
            # parallel below); hidden layers 1,3,5 consume mp-sharded
            # features row-parallel, 2,4,6 re-split column-parallel.
            return P("mp", None) if idx % 2 else P(None, "mp")
        if d_out == hidden:
            return P(None, "mp")   # input projection: column-parallel
        if d_in == hidden:
            return P("mp", None)   # output head: row-parallel
    return P()


def state_shardings(mesh: Mesh, state, hidden: int = 512):
    """NamedShardings for a TrainState pytree: TP on the wide MLP kernels,
    Adam moments follow their parameters, small leaves replicated."""

    def shard_params(tree):
        flat = jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf, hidden)),
            tree,
        )
        return flat

    def shard_like_params(tree):
        # optax ScaleByAdamState contains (count, mu, nu); mu/nu mirror params
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(
                mesh,
                _param_spec(path, leaf, hidden) if leaf.ndim >= 2 else P(),
            ),
            tree,
        )

    return type(state)(
        params=shard_params(state.params),
        batch_stats=jax.tree_util.tree_map(
            lambda _: replicated(mesh), state.batch_stats
        ),
        opt_emg=shard_like_params(state.opt_emg),
        opt_glove=shard_like_params(state.opt_glove),
    )
