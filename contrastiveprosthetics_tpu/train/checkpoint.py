"""Checkpointing (reference ``torch.save(model.state_dict())``,
``train.py:122-126``; reload at ``train.py:216`` / ``results.py:92-93``).

Uses flax's msgpack serialization of the full ``TrainState`` pytree
(params + batch-stats + both Adam states) so warm starts (``--load_model``,
train.py:68-70) resume the optimizers too — a strict superset of the
reference's weights-only checkpoint.
"""
from __future__ import annotations

import os

from flax import serialization


def save_checkpoint(path: str, state) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))


def load_checkpoint(path: str, template):
    """Restore into the structure of ``template`` (a freshly built state)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def template_state(model, cfg):
    """A fresh ``TrainState`` matching ``Trainer.init_state``'s structure
    (engine.py:207-225) without needing a DeviceStore — the restore
    template for checkpoint loads outside a training context
    (``cptpu-serve``, ``cptpu-import``)."""
    import jax
    import jax.numpy as jnp
    import optax

    from contrastiveprosthetics_tpu.train.engine import TrainState

    key = jax.random.PRNGKey(0)
    T = cfg.max_tasks
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, T, cfg.emg_dim)), jnp.zeros((2, T, cfg.glove_dim)),
        0.5, 0.5, True,
    )
    params = dict(variables["params"])
    params.setdefault("emg_net", {})
    params.setdefault("glove_net", {})
    opt = optax.scale_by_adam()
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_emg=opt.init(params["emg_net"]),
        opt_glove=opt.init(params["glove_net"]),
    )


# --------------------------------------------------------------------- orbax
def save_checkpoint_orbax(path: str, state) -> None:
    """Orbax backend: directory-based, async-capable, multi-host-ready —
    for deployments where the msgpack single-file format isn't enough."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)


def load_checkpoint_orbax(path: str, template):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path), item=template)
