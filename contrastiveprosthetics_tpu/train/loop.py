"""High-level training loop (reference ``train_loop``/``validate``/``test``,
``train.py:27-138``): Python drives epochs; each epoch body is the jitted
device program from the engine.

Checkpoint rule (quirk ledger, config.py): default saves on val-loss
*improvement* (``loss_val <= min(val_losses)``); with
``compat_checkpoint_on_max`` it reproduces the reference's literal
``loss_val <= max(val_losses so far)`` (train.py:122-126 — *max*, which
checkpoints nearly every epoch, so near-last-epoch weights reach test).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from contrastiveprosthetics_tpu.train.checkpoint import save_checkpoint
from contrastiveprosthetics_tpu.train.engine import EvalResult, Hyper, Trainer
from contrastiveprosthetics_tpu.train.schedules import schedule_factors


@dataclasses.dataclass
class LoopResult:
    val_loss: float
    val_acc: float
    train_losses: list
    train_accs: list
    state: object


def train_loop(
    trainer: Trainer,
    hyper: Hyper,
    epochs: int,
    key: jax.Array,
    annealing: bool = False,
    checkpoint: bool = False,
    checkpoint_path: Optional[str] = None,
    init_state=None,
    verbose: bool = True,
) -> LoopResult:
    """Train ``epochs`` epochs, validating per epoch when verbose
    (train.py:92-136)."""
    k_init, key = jax.random.split(key)
    state = init_state if init_state is not None else trainer.init_state(k_init)
    emg_f, glove_f = schedule_factors(
        epochs, annealing, trainer.cfg.compat_shared_steplr
    )

    if not verbose and not checkpoint and epochs > 1:
        # no per-epoch host work → the whole run is ONE device dispatch
        # (engine.train_epochs: lax.scan over epochs), then the reference's
        # single end-of-run validation (train.py:131-136). Keys are derived
        # with the EXACT chain of the sequential loop below, so the same
        # seed trains the same weights regardless of verbose/checkpoint.
        ep_keys = []
        k_val = key
        for _ in range(epochs):
            key, k_ep, k_val = jax.random.split(key, 3)
            ep_keys.append(k_ep)
        state, losses, accs = trainer.train_epochs(
            state, jnp.stack(ep_keys), hyper, emg_f, glove_f
        )
        res = trainer.evaluate(state, k_val, hyper, split="val")
        return LoopResult(
            val_loss=float(res.loss),
            val_acc=float(res.accuracy),
            train_losses=[float(x) for x in losses],
            train_accs=[float(x) for x in accs],
            state=state,
        )

    val_losses = []
    train_losses, train_accs = [], []
    loss_val = acc_val = float("nan")
    for e in range(epochs):
        key, k_ep, k_val = jax.random.split(key, 3)
        state, loss_t, acc_t = trainer.train_epoch(
            state, k_ep, hyper, emg_f[e], glove_f[e]
        )
        train_losses.append(float(loss_t))
        train_accs.append(float(acc_t))

        # checkpointing needs a per-epoch val signal (train.py:110-126
        # validates every epoch); without it only the last epoch is scored
        if verbose or checkpoint or e == epochs - 1:
            res = trainer.evaluate(state, k_val, hyper, split="val")
            loss_val, acc_val = float(res.loss), float(res.accuracy)
            val_losses.append(loss_val)
            if verbose:
                print(
                    f"Epoch {e}. Train loss: {train_losses[-1]:.4f}\t"
                    f"Val loss: {loss_val:.4f}\tVal acc: {acc_val:.6f}\t"
                    f"Train acc: {train_accs[-1]:.4f}"
                )
        threshold = max if trainer.cfg.compat_checkpoint_on_max else min
        if checkpoint and val_losses and loss_val <= threshold(val_losses):
            if checkpoint_path:
                save_checkpoint(checkpoint_path, state)

    return LoopResult(
        val_loss=loss_val,
        val_acc=acc_val,
        train_losses=train_losses,
        train_accs=train_accs,
        state=state,
    )


def run_test(trainer: Trainer, state, hyper: Hyper, key: jax.Array) -> EvalResult:
    """Final test pass (train.py:27-44): batches of batch_size·8."""
    return trainer.evaluate(state, key, hyper, split="test")
