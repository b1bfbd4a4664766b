"""The training engine: whole epochs as single jitted XLA programs.

Reference train loop (train.py:65-138) per batch: Python DataLoader drives
GPU gathers, a Python loop computes per-item CE, two Adam steps. Here one
``lax.scan`` over the per-epoch batch-index matrix runs gather → forward →
vectorized loss → both Adam updates entirely on device; an epoch is one
dispatch. Evaluation likewise scans eval batches and computes the voting
curves with the cumsum kernel.

Everything hyperparameter-shaped (lr, reg, dropout) is a *traced* input, so
``jax.vmap`` over the hyper/state axis turns the 150-config random search
into a single XLA program training all configs simultaneously (see
``train/crossval.py``) — that is where the ≥10×/chip target is won.
"""
from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from contrastiveprosthetics_tpu.config import Config
from contrastiveprosthetics_tpu.data.sampler import (
    epoch_batches,
    epoch_batches_padded,
    gather_eval_batch,
    gather_glove_batch,
    gather_train_batch,
    identity_permutations,
    task_permutations,
)
from contrastiveprosthetics_tpu.data.store import DeviceStore
from contrastiveprosthetics_tpu.models.clip import ContrastiveModel, l2_penalty
from contrastiveprosthetics_tpu.train.loss import (
    contrastive_train_accuracy,
    prediction_accuracy,
    prediction_loss,
    prediction_loss_per_item,
    symmetric_contrastive_loss,
    symmetric_contrastive_loss_per_item,
)
from contrastiveprosthetics_tpu.eval.voting import vote_from_logits


class Hyper(NamedTuple):
    """Traced hyperparameters (the reference's ``params`` dict minus the
    static d_e/epochs, train.py:149-153,202-211)."""

    lr_emg: jax.Array
    reg_emg: jax.Array
    dp_emg: jax.Array
    lr_glove: jax.Array
    reg_glove: jax.Array
    dp_glove: jax.Array

    @classmethod
    def single(cls, lr_emg, reg_emg, dp_emg, lr_glove, reg_glove, dp_glove):
        return cls(*[jnp.float32(v) for v in
                     (lr_emg, reg_emg, dp_emg, lr_glove, reg_glove, dp_glove)])


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_emg: Any
    opt_glove: Any


class EvalResult(NamedTuple):
    loss: jax.Array      # scalar mean loss
    accuracy: jax.Array  # scalar voted accuracy (or frame accuracy w/o vote)
    curve: jax.Array     # (D, n_prefix) per-item voting curves (item order)
    y_pred: jax.Array    # (D, T)
    y_true: jax.Array    # (D, T)
    logits: jax.Array    # (D·W, T, T) raw logits in item order (logs.npy)


@dataclasses.dataclass
class Trainer:
    """Builds and caches the jitted train/eval programs for one dataset+mode.

    Structure-static switches (adabn/prediction/...) select the compiled
    program; everything numeric is traced.
    """

    cfg: Config
    store: DeviceStore
    db2: bool = False
    adabn: bool = True
    prediction: bool = False
    glove: bool = False
    glove_encoding: bool = False
    d_e: int = 16
    batch_size: int = 8
    # Pallas kernels (ops/pallas_ops.py), A/B'd on v5e over full training
    # epochs at the canonical geometry (bs=8, T=41, d_e=16):
    #   fused loss   1.94M windows/s vs 1.87M XLA  → default ON on TPU
    #     (the custom VJP skips autodiff through the materialized logits)
    #   ...and A/B-NEUTRAL inside the vmapped crossval sweep (phase-
    #   isolated v5e bench: 1.3728M w/s either impl — the sweep is
    #   HBM/optimizer-bound, the loss is noise), so the flag is honored
    #   there too
    # A fused gather+normalize kernel was tried and DELETED: at 48-byte rows
    # (C=12 f32) every variant is DMA-latency-bound and lost to XLA's
    # vectorized take (1.42M vs 1.87M windows/s) — see ops/pallas_ops.py.
    use_pallas_loss: Optional[bool] = None  # None → auto (TPU only)
    # Fused whole-encoder inference kernel (ops/pallas_ops.py §2) for the
    # fixed-normalization eval path (contrastive, plain-BN, one-hot class
    # encoder): the full conv→MLP→head→similarity forward in one
    # pallas_call with all weights VMEM-resident. None → OFF until its
    # TPU A/B is recorded (the no-kernel-ships-without-a-winning-A/B
    # rule); set True to select it explicitly (interpret mode off-TPU).
    use_fused_encoder: Optional[bool] = None
    # Fused TRAINING chain (ops/train_fused.py): the dense stack's
    # forward+backward as per-block Pallas kernels whose epilogues
    # accumulate the BatchNorm statistics (fwd Σr/Σr², bwd Σdz/Σdz·x̂)
    # while the GEMM tiles are in VMEM — built against the round-3
    # peak-geometry attribution (252 µs/step of convert_reduce_fusion =
    # HBM activation re-reads, docs/SCALING.md). Dropout masks come from
    # the TPU hardware PRNG (a different — equally valid — stream than
    # the flax path; rate 0 is mask-free and matches flax to f32
    # roundoff). Contrastive training only (prediction mode stays XLA).
    # None → auto (see __post_init__ for the recorded A/B and verdict).
    use_fused_train: Optional[bool] = None
    # architecture knobs (defaults = reference parity); shrink in tests to
    # keep CPU GSPMD compiles tractable
    n_linear: int = 7
    hidden: int = 512
    # encoder compute dtype: "bfloat16" runs the conv/MLP GEMMs MXU-native
    # (params, loss, optimizer state stay float32 — mixed precision).
    # A/B at the canonical geometry (bs=8): 1.88M w/s either way — the
    # 328-row steps are scheduling-bound, not MXU-bound; bf16 pays off at
    # larger batch sizes / model widths.
    compute_dtype: str = "float32"
    # batch-scan unroll: TPU while-loop iterations carry per-step overhead
    # that the 328-row canonical bodies don't amortize. A/B on v5e (bs=8,
    # ms/epoch): unroll 1 → 42.5, 2 → 36.2, 4 → 36.5, 8 → 36.4 (+17% at
    # 2, flat beyond). Semantically identical (unroll replicates the scan
    # body). None → 2 on TPU, 1 elsewhere (XLA:CPU compile cost doubles
    # per unroll step for zero benefit there).
    scan_unroll: Optional[int] = None
    # Adam first-moment dtype: "bfloat16" halves the mu read+write HBM
    # traffic (the memory-roofline memo's first named lever — mu is 2P of
    # the 6P-word floor, docs/SCALING.md). Measured A/B at canonical
    # geometry (v5e, rbg, marginal slopes, idle box, 2026-08-19):
    # 3.459M f32 vs 3.492M bf16-mu windows/s — +0.95 %, inside noise →
    # the canonical step's floor gap is NOT mu-traffic-bound in practice
    # (latency/scheduling of the bs=8 step dominates; see SCALING memo).
    # Parity default: float32 (the reference's torch Adam keeps f32
    # moments). optax casts mu only; nu stays f32.
    adam_mu_dtype: str = "float32"
    # Rematerialize the forward inside the backward (jax.checkpoint over
    # the whole loss): trades ~1 extra forward of MXU FLOPs for not
    # storing/re-reading the activation stack across the fwd→bwd HBM
    # boundary. Gradients are bitwise-identical (same dropout key replays
    # the same masks; pinned in test_train_e2e). Measured A/B at the peak
    # geometry (bs=128 bf16 rbg, v5e, marginal slopes, fresh process per
    # leg, 2026-08-19): 6.64M windows/s OFF vs 4.92M ON (−26 %, trial
    # spread ±3 %) — at this geometry the step is MXU-bound enough that
    # the recompute forward costs more than the ~150 MB/step of activation
    # traffic it saves, consistent with the roofline census (HBM ≈ 31 % of
    # the step). Default OFF everywhere; the knob exists for future
    # wider-model configurations where activations outgrow HBM/VMEM.
    remat: bool = False

    def __post_init__(self):
        if self.use_pallas_loss is None or self.scan_unroll is None:
            from contrastiveprosthetics_tpu.ops.pallas_ops import on_tpu

            tpu = on_tpu()
            if self.use_pallas_loss is None:
                self.use_pallas_loss = tpu
            if self.scan_unroll is None:
                # re-scanned under the hardware-RNG default (v5e, rbg
                # epoch keys, marginal slopes): unroll 1 → 2.75M
                # windows/s, 2 → 3.38-3.50M, 4 → 3.36M — 2 stays optimal
                self.scan_unroll = 2 if tpu else 1
        if self.use_fused_encoder is None:
            # stays OFF by default — re-decided round 3 with the variance
            # treatment VERDICT r2 #3 asked for (median of 4×200-pass
            # trials, per-trial lists recorded in eval_encoder_ab_trials,
            # serialized runs on an idle box). Three clean v5e runs
            # (2026-08-19): the throughput itself is BIMODAL with the
            # axon server's dispatch regime (22.2-22.4 M windows/s after
            # small-program histories vs 11.6-13.1 M after large-program
            # histories — the server outlives client processes; in-band
            # marker: eval_rtt_null_p50_ms), and inside that the
            # fused-vs-xla delta FLIPS SIGN: fast regime fused +0.8 %
            # (inside the ~1 % trial spread) with xla +8.6 % at bs=D;
            # slow regime fused +5.5 % in one run, xla +13 % in the next
            # (trial spread ±15 %). Signal < spread in every direction →
            # no default flip; the kernel's wins are the serve tick
            # chains (13.1×/9.6×), where it IS the default.
            self.use_fused_encoder = False
        # the fused encoder requires inference-affine normalization and the
        # shared one-hot class embedding (see ops/pallas_ops.py §2)
        self._fused_encoder_eligible = (
            not self.adabn and not self.prediction and not self.glove_encoding
        )
        if self.use_fused_train is None:
            # OFF — the recorded TPU A/B is a LOSS at every batch size
            # under the shipped rbg default (v5e, marginal slopes, one
            # leg per process, alternating trials, 2026-08-20;
            # docs/ab_fused_train_r04.jsonl + SCALING round-4 table):
            #   bs=8 f32 −13 %, bs=128 bf16 −27 % (4.94 vs 6.74 M
            #   windows/s median), bs=256 −8 %, bs=512 −22 %,
            #   bs=D=1800 −14 %.
            # Round 5 CLOSED the question with direct measurement
            # (docs/pallas_call_overhead_r05.json +
            # fused_chain_decompose_r05.json, SCALING.md round-5
            # closure): the round-4 "14 calls of choreography"
            # attribution is REFUTED — fixed pallas_call cost is
            # 0.7 µs, the real call→stat-glue→call dependency pattern
            # 4.9 µs/call, so all 14 calls cost ≤ 68 µs of the
            # 208-284 µs gap; a reduced-call variant cannot win. The
            # deficit is in-kernel Mosaic codegen quality: fwd −52 µs,
            # bwd −156 µs (≈22 µs/block, the wgrad/reduction epilogue)
            # vs XLA at identical math. The fusion is real per-byte
            # (convert_reduce_fusion 19.4 % → 1.9 % at bs=D) and the
            # chain+hardware-PRNG beats a THREEFRY XLA leg at bs=D by
            # +12 % — the recorded escape hatch for threefry-pinned
            # huge-batch configs. Set True to select explicitly
            # (interpret mode off-TPU).
            self.use_fused_train = False
        self._fused_train_eligible = not self.prediction
        if self.use_fused_train and not self._fused_train_eligible:
            import warnings

            # never let an explicit request silently measure the XLA path
            # (an A/B would record a phantom tie) — same rule as the
            # fused-encoder eval fallback below
            warnings.warn(
                "use_fused_train requested but prediction mode is "
                "ineligible (the fused chain trains the contrastive "
                "embedding only); falling back to the XLA train path."
            )
        self.model = ContrastiveModel(
            d_e=self.d_e,
            emg_dim=self.cfg.emg_dim,
            glove_dim=self.cfg.glove_dim,
            n_classes=self.cfg.max_tasks,
            adabn=self.adabn,
            prediction=self.prediction,
            glove=self.glove,
            glove_encoding=self.glove_encoding,
            n_linear=self.n_linear,
            hidden=self.hidden,
            dtype=jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32,
        )
        self.view_train = self.store.view("train", db2=self.db2)
        self.view_val = self.store.view("val", db2=self.db2)
        self.view_test = self.store.view("test", db2=self.db2)
        self._opt = optax.scale_by_adam(
            mu_dtype=(jnp.bfloat16 if self.adam_mu_dtype == "bfloat16"
                      else None)
        )
        self._init_jit = None
        self._train_epoch_jit = None
        self._train_epochs_jit = None
        self._eval_jit = {}
        self._sweep_jit = {}

    # ------------------------------------------------------------------ init
    def _init_state(self, key: jax.Array) -> TrainState:
        T = self.view_train.n_tasks
        emg = jnp.zeros((2, T, self.cfg.emg_dim), jnp.float32)
        glove = jnp.zeros((2, T, self.cfg.glove_dim), jnp.float32)
        variables = self.model.init(
            {"params": key, "dropout": key}, emg, glove, 0.5, 0.5, True
        )
        params = dict(variables["params"])
        # in prediction mode only the active encoder is traced/created
        # (reference keeps both nets but only one receives gradients)
        params.setdefault("emg_net", {})
        params.setdefault("glove_net", {})
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_emg=self._opt.init(params["emg_net"]),
            opt_glove=self._opt.init(params["glove_net"]),
        )

    def init_state(self, key: jax.Array) -> TrainState:
        """A fresh TrainState, built as ONE jitted program.

        Un-jitted flax ``model.init`` + optax init dispatch each parameter
        as its own tiny program — ~28 s of round-trips on the
        remote-attached TPU vs one dispatch here. Composable under
        vmap/jit (the inner jit inlines; the sweep vmaps this in-graph,
        ``_sweep_chunk_at``)."""
        if self._init_jit is None:
            self._init_jit = jax.jit(self._init_state)
        state = self._init_jit(key)
        # Commit the state to the store's device when the store is committed:
        # the views are committed jit arguments, which makes every program
        # output committed — an UNcommitted fresh state would then give the
        # first call a different argument-sharding signature than all later
        # calls and double-compile every train/eval program (13.5 s per extra
        # lowering of the 5-epoch program on v5e; see DeviceStore.device).
        # Skipped while tracing (vmapped in-graph init in the sweep).
        if self.store.device is not None and not isinstance(
            key, jax.core.Tracer
        ):
            state = jax.device_put(state, self.store.device)
        return state

    # ------------------------------------------------------------- train step
    def _loss_and_metrics(self, params, batch_stats, emg_b, glove_b, hyper,
                          dropout_key, train: bool):
        if train and self.use_fused_train and self._fused_train_eligible:
            from contrastiveprosthetics_tpu.ops.pallas_ops import (
                fused_contrastive_loss,
                on_tpu,
            )
            from contrastiveprosthetics_tpu.ops.train_fused import (
                fused_emg_embed,
            )

            B, T = emg_b.shape[:2]
            k_emg, k_glove = jax.random.split(dropout_key)
            e, emg_updates = fused_emg_embed(
                params["emg_net"], emg_b.reshape(-1, self.cfg.emg_dim),
                hyper.dp_emg, k_emg,
                compute_dtype=self.model.dtype,
                batch_stats=batch_stats, adabn=self.adabn,
                interpret=not on_tpu(),
            )
            e = e.reshape(B, T, self.d_e)
            e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
            g, g_upd = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                glove_b, hyper.dp_glove, True,
                rngs={"dropout": k_glove},
                mutable=["batch_stats"],
                method=ContrastiveModel.embed_glove,
            )
            if self.use_pallas_loss:
                loss, correct = fused_contrastive_loss(e, g, not on_tpu())
                acc = correct / (B * T)
            else:
                logits = jnp.einsum("ntd,nsd->nts", e, g)
                loss = symmetric_contrastive_loss(logits)
                acc = contrastive_train_accuracy(logits)
            if self.adabn:
                new_bs = batch_stats
            else:
                new_bs = dict(batch_stats)
                new_bs["emg_net"] = emg_updates
                gbs = g_upd.get("batch_stats", {})
                if "glove_net" in gbs:
                    new_bs["glove_net"] = gbs["glove_net"]
            return loss, (acc, new_bs, None)
        if train and self.use_pallas_loss and not self.prediction:
            from contrastiveprosthetics_tpu.ops.pallas_ops import (
                fused_contrastive_loss,
                on_tpu,
            )

            (e, g), updates = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                emg_b, glove_b, hyper.dp_emg, hyper.dp_glove, True,
                rngs={"dropout": dropout_key},
                mutable=["batch_stats"],
                method=ContrastiveModel.embed,
            )
            loss, correct = fused_contrastive_loss(e, g, not on_tpu())
            acc = correct / (e.shape[0] * e.shape[1])
            new_bs = updates["batch_stats"] if not self.adabn else batch_stats
            return loss, (acc, new_bs, None)
        out, updates = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            emg_b, glove_b, hyper.dp_emg, hyper.dp_glove, train,
            rngs={"dropout": dropout_key},
            mutable=["batch_stats"],
        )
        if self.prediction:
            T = self.view_train.n_tasks
            labels = jnp.tile(jnp.arange(T), emg_b.shape[0])
            loss = prediction_loss(out, labels)
            acc = prediction_accuracy(out, labels)
        else:
            loss = symmetric_contrastive_loss(out)
            acc = contrastive_train_accuracy(out)
        new_bs = updates["batch_stats"] if not self.adabn else batch_stats
        return loss, (acc, new_bs, out)

    def _sgd_step(self, state: TrainState, emg_b, glove_b, hyper: Hyper,
                  lr_emg, lr_glove, dropout_key):
        """One optimization step: forward → loss(+L2) → grads → two Adam
        updates. This is the unit the multi-chip SPMD path shards
        (parallel/spmd.py)."""
        def loss_fn(p):
            loss, aux = self._loss_and_metrics(
                p, state.batch_stats, emg_b, glove_b, hyper, dropout_key, True
            )
            # prediction mode penalizes only the active net (models.py:225-228)
            total = (
                loss
                + hyper.reg_emg * l2_penalty(p.get("emg_net", {}))
                + hyper.reg_glove * l2_penalty(p.get("glove_net", {}))
            )
            return total, (loss, aux)

        if self.remat:
            loss_fn = jax.checkpoint(loss_fn)
        (_, (loss, (acc, new_bs, _))), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        up_e, opt_emg = self._opt.update(
            grads["emg_net"], state.opt_emg, state.params["emg_net"]
        )
        up_g, opt_glove = self._opt.update(
            grads["glove_net"], state.opt_glove, state.params["glove_net"]
        )
        new_params = {
            "emg_net": jax.tree_util.tree_map(
                lambda p, u: p - lr_emg * u, state.params["emg_net"], up_e
            ),
            "glove_net": jax.tree_util.tree_map(
                lambda p, u: p - lr_glove * u, state.params["glove_net"], up_g
            ),
        }
        return TrainState(new_params, new_bs, opt_emg, opt_glove), loss, acc

    def _train_epoch(self, state: TrainState, key: jax.Array, hyper: Hyper,
                     lr_emg_factor, lr_glove_factor, view):
        """One full epoch: permutations + batch scan, all on device.

        ``view`` (the train SplitView) is an *argument*, not a closure
        capture: closed-over ``jax.Array``s are baked into the lowered HLO
        as literals, which makes every program's compile-cache key depend on
        the dataset bytes and ships the whole store to the compile service
        (measured 480 s cold compiles per process on v5e)."""
        v = view
        k_perm, k_glove, k_order, k_drop = jax.random.split(key, 4)
        emg_rand = task_permutations(k_perm, v.n_tasks, v.D)
        glove_rand = task_permutations(k_glove, v.n_tasks, v.D_glove)
        batches, tail = epoch_batches(k_order, v.D, self.batch_size)
        lr_e = hyper.lr_emg * lr_emg_factor
        lr_g = hyper.lr_glove * lr_glove_factor

        def body(carry, items):
            state, step = carry
            dkey = jax.random.fold_in(k_drop, step)
            emg_b = gather_train_batch(v.emg_flat, emg_rand, items)
            emg_b = emg_b.reshape(items.shape[0], v.n_tasks, self.cfg.emg_dim)
            glove_b = gather_glove_batch(v.glove_flat, glove_rand, items, v.D_glove)
            new_state, loss, acc = self._sgd_step(
                state, emg_b, glove_b, hyper, lr_e, lr_g, dkey
            )
            return (new_state, step + 1), (loss, acc)

        if batches.shape[0] == 1:
            # single-batch epoch: skip lax.scan — identical semantics, and
            # XLA:CPU executes large GEMM/conv bodies INSIDE while-loops via
            # a pathologically slow path (measured 28 s vs 1.5 s for the
            # same body at bs=300); TPU is unaffected either way
            (carry, _), (loss, acc) = body((state, 0), batches[0])
            losses, accs = loss[None], acc[None]
            state = carry
        else:
            (state, _), (losses, accs) = jax.lax.scan(
                body, (state, 0), batches, unroll=self.scan_unroll
            )
        if tail.shape[0]:
            # the trailing partial batch trains too (DataLoader
            # drop_last=False, train.py:86): a genuinely smaller batch —
            # its BN statistics come from its own items, exactly the
            # reference's semantics — instantiated straight-line in the
            # same program (one extra static body at bs = D % batch_size)
            (state, _), (loss_t, acc_t) = body((state, batches.shape[0]), tail)
            losses = jnp.concatenate([losses, loss_t[None]])
            accs = jnp.concatenate([accs, acc_t[None]])
        if losses.shape[0] == 1:
            return state, losses[0], accs[0]
        return state, losses.mean(), accs.mean()

    def train_epoch(self, state, key, hyper, lr_emg_factor=1.0, lr_glove_factor=1.0):
        if self._train_epoch_jit is None:
            self._train_epoch_jit = jax.jit(self._train_epoch, donate_argnums=(0,))
        return self._train_epoch_jit(
            state, key, hyper,
            jnp.float32(lr_emg_factor), jnp.float32(lr_glove_factor),
            self.view_train,
        )

    def _train_epochs(self, state: TrainState, keys: jax.Array, hyper: Hyper,
                      emg_factors, glove_factors, view):
        """A whole multi-epoch run as ONE jitted program: ``lax.scan`` over
        epochs with per-epoch keys and the schedule factors
        (train/schedules.py) as scanned arrays. Amortizes per-epoch
        dispatch — material on remote-attached TPUs where each dispatch
        costs ~ms against a ~40 ms epoch. Used by train_loop when no
        per-epoch host work (verbose printing / checkpoint-on-val) is
        requested; the caller supplies the per-epoch keys so the fused and
        sequential paths share one RNG stream."""
        if keys.shape[0] == 1:
            # single epoch (common for --crossval_epochs=1): skip the scan —
            # identical semantics, and XLA:CPU runs sizeable scan bodies
            # ~20× slower than straight-line code (see _train_epoch)
            state, loss, acc = self._train_epoch(
                state, keys[0], hyper, emg_factors[0], glove_factors[0], view
            )
            return state, loss[None], acc[None]

        def body(carry, xs):
            k, f_e, f_g = xs
            new_state, loss, acc = self._train_epoch(
                carry, k, hyper, f_e, f_g, view
            )
            return new_state, (loss, acc)

        state, (losses, accs) = jax.lax.scan(
            body, state, (keys, emg_factors, glove_factors)
        )
        return state, losses, accs

    def train_epochs(self, state, keys, hyper, emg_factors, glove_factors):
        """Run len(emg_factors) epochs in one dispatch; ``keys`` is one PRNG
        key per epoch. Returns (state, per-epoch losses, per-epoch accs)."""
        if self._train_epochs_jit is None:
            self._train_epochs_jit = jax.jit(
                self._train_epochs, donate_argnums=(0,)
            )
        return self._train_epochs_jit(
            state, keys, hyper,
            jnp.asarray(emg_factors, jnp.float32),
            jnp.asarray(glove_factors, jnp.float32),
            self.view_train,
        )

    def _sweep_run(self, state: TrainState, ep_keys: jax.Array,
                   val_key: jax.Array, hyper: Hyper, emg_factors,
                   glove_factors, train_view, val_view,
                   val_batch_size: int):
        """One config's ENTIRE crossval run — every epoch (``_train_epochs``
        scan) plus the final metrics-only validation — as one traceable
        function. ``train/crossval.py`` vmaps this over the config axis and
        jits once, so a whole sweep chunk (init → E epochs → val for all
        configs) is a SINGLE XLA dispatch: no per-epoch host round-trips,
        and the MXU sees every GEMM batched configs× (the treatment
        ``train_epochs`` gives single runs, applied to the sweep —
        VERDICT r1 next-round #2). Returns (val_loss, val_acc)."""
        state, _, _ = self._train_epochs(
            state, ep_keys, hyper, emg_factors, glove_factors, train_view
        )
        return self._evaluate_scalars(
            state, val_key, hyper, val_view, val_batch_size
        )

    def _sweep_chunk_at(self, hypers_chunks: Hyper, ci: jax.Array,
                        key: jax.Array, emg_factors, glove_factors,
                        train_view, val_view,
                        val_batch_size: int, chunk: int):
        """One sweep chunk, fully in-graph: slice chunk ``ci`` out of the
        device-resident chunk table, derive its keys from the chunk-start
        chain ``fold_in(key, ci·chunk)``, init the states, run every epoch
        and the validation (``_sweep_run``) for all ``chunk`` configs.

        The caller jits this ONCE and fires one dispatch per chunk with
        ``ci`` as a traced scalar — zero host→device transfers or syncs
        inside the sweep loop, so the chunk dispatches pipeline back to
        back on device. Design history (v5e, 150 configs × width 5): the
        same body dispatched this way runs 150 ms/chunk; wrapping the
        chunk loop in a device-side ``lax.scan`` instead ran 357 ms/chunk
        (while-loop bodies lose overlap/fusion), and a host loop that
        re-staged inputs per chunk plateaued at ~350 ms/chunk on host
        transfer round trips. Returns (chunk,) losses and accuracies."""
        epochs = emg_factors.shape[0]
        h = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(x, ci, 0, keepdims=False),
            hypers_chunks,
        )
        start = ci * chunk
        k_chunk = jax.random.fold_in(key, start)
        init_keys = jax.random.split(jax.random.fold_in(k_chunk, 0), chunk)
        states = jax.vmap(self.init_state)(init_keys)
        ep_keys = jnp.stack(
            [
                jax.random.split(jax.random.fold_in(k_chunk, 100 + e), chunk)
                for e in range(epochs)
            ],
            axis=1,
        )
        val_keys = jax.random.split(jax.random.fold_in(k_chunk, 999), chunk)
        return jax.vmap(
            lambda s, ek, vk, hh: self._sweep_run(
                s, ek, vk, hh, emg_factors, glove_factors,
                train_view, val_view, val_batch_size
            ),
        )(states, ep_keys, val_keys, h)

    def sweep_chunk_at(self, hypers_chunks, ci, key, emg_factors,
                       glove_factors, val_batch_size: int, chunk: int):
        """Jit-cached entry for ``_sweep_chunk_at``. The jit object lives
        on the trainer (like ``train_epochs``): a fresh ``jax.jit`` per
        ``cross_validate`` call would re-TRACE the whole sweep graph every
        invocation — several seconds of host time that measured as a
        phantom 2.5× sweep slowdown (975k vs 2.46M windows/s on v5e)
        before the compile cache even matters."""
        sig = (chunk, val_batch_size)
        if sig not in self._sweep_jit:
            fn = partial(
                self._sweep_chunk_at,
                val_batch_size=val_batch_size,
                chunk=chunk,
            )
            # carry the name through partial so the compiled module (and its
            # persistent-cache entries) read jit__sweep_chunk_at, not
            # jit__unknown
            functools.update_wrapper(fn, self._sweep_chunk_at)
            self._sweep_jit[sig] = jax.jit(fn)
        return self._sweep_jit[sig](
            hypers_chunks, ci, key, emg_factors, glove_factors,
            self.view_train, self.view_val,
        )

    # ------------------------------------------------------------------ eval
    def _evaluate(self, state: TrainState, key: jax.Array, hyper: Hyper,
                  view, batch_size: int) -> EvalResult:
        """Full-split evaluation. Every item is evaluated exactly once: a
        trailing partial batch is padded by wrapping (DataLoader
        drop_last=False semantics, train.py:32,51) and pad duplicates are
        weighted out of the loss; per-item outputs are un-shuffled back to
        item order through a full-length inverse permutation. ``view`` is
        the split's SplitView, passed as an argument (see _train_epoch)."""
        v = view
        cfg = self.cfg
        W = cfg.prediction_window_size
        n_prefix = cfg.n_voting_cols
        T = v.n_tasks
        k_perm, k_glove, k_order = jax.random.split(key, 3)
        emg_rand = task_permutations(k_perm, T, v.D)
        glove_rand = task_permutations(k_glove, T, v.D_glove)
        batches, weights, inv = epoch_batches_padded(k_order, v.D, batch_size)
        bs = batches.shape[1]

        use_fused = (self.use_fused_encoder and self._fused_encoder_eligible
                     and T == self.cfg.max_tasks)
        if self.use_fused_encoder and not use_fused:
            import warnings

            # trace-time only: never let an explicit request silently
            # measure the XLA path (an A/B would record a phantom tie)
            warnings.warn(
                "use_fused_encoder requested but this eval config is "
                "ineligible (needs plain-BN contrastive one-hot and "
                f"n_tasks == {self.cfg.max_tasks}); falling back to the "
                "XLA path", stacklevel=2,
            )
        if use_fused:
            from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
            from contrastiveprosthetics_tpu.ops.pallas_ops import (
                fold_encoder_params,
                fused_encoder_logits,
                on_tpu,
            )

            # folded once per eval call (outside the batch scan)
            class_emb = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                method=ContrastiveModel.encode_classes,
            )
            folded = fold_encoder_params(
                state.params, state.batch_stats, class_emb,
                dtype=self.model.dtype,  # matches the XLA path's precision
            )

        def body(_, batch):
            items, w = batch  # (bs,), (bs,)
            emg_b = gather_eval_batch(v.emg_groups, emg_rand, items)
            # (bs, T, W, 12)
            glove_b = gather_glove_batch(v.glove_flat, glove_rand, items, v.D_glove)
            if use_fused:
                flat = fused_encoder_logits(
                    emg_b.reshape(-1, cfg.emg_dim), folded, not on_tpu()
                )  # (bs·T·W, T) in (item, task, frame) row order
                out = flat.reshape(bs, T, W, T).transpose(0, 2, 1, 3)
                out = out.reshape(bs * W, T, T)  # clip.py vote row order
            else:
                out, _ = self.model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    emg_b, glove_b, hyper.dp_emg, hyper.dp_glove, False,
                    mutable=["batch_stats"],
                )
            if self.prediction:
                labels = jnp.tile(jnp.arange(T), bs)
                if out.ndim == 2:
                    # glove-prediction path has no vote window (models.py:187)
                    item_loss = prediction_loss_per_item(out, labels, bs)
                    votes = jnp.argmax(out, axis=-1).reshape(bs, T)
                else:
                    # (bs·T, W, C): CE over all frames, majority vote over W
                    item_loss = prediction_loss_per_item(
                        out.reshape(-1, self.cfg.max_tasks),
                        jnp.repeat(labels, W),
                        bs,
                    )
                    votes = jnp.argmax(
                        jnp.sum(jax.nn.one_hot(jnp.argmax(out, -1),
                                               self.cfg.max_tasks), axis=1),
                        axis=-1,
                    ).reshape(bs, T)
                curve = jnp.broadcast_to(
                    (votes == jnp.arange(T)).astype(jnp.float32).mean(-1)[:, None],
                    (bs, n_prefix),
                )
                y_true = jnp.broadcast_to(jnp.arange(T), (bs, T))
                logits_out = jnp.zeros((bs, W, T, T), jnp.float32)
                return None, (jnp.sum(item_loss * w), curve, votes, y_true,
                              logits_out)
            logits = out
            item_loss = symmetric_contrastive_loss_per_item(
                logits
            ).reshape(bs, W).mean(axis=-1)
            res = vote_from_logits(logits, window=W, n_prefix=n_prefix)
            return None, (jnp.sum(item_loss * w), res.curve, res.y_pred,
                          res.y_true, logits.reshape(bs, W, T, T))

        if batches.shape[0] == 1:
            # single eval batch (common: test bs = 8·bs ≥ D): skip lax.scan
            # — XLA:CPU's while-loop path for large bodies is ~20× slower
            _, out = body(None, (batches[0], weights[0]))
            loss_sums, curves, y_preds, y_trues, logits = jax.tree_util.tree_map(
                lambda x: x[None], out
            )
        else:
            _, (loss_sums, curves, y_preds, y_trues, logits) = jax.lax.scan(
                body, None, (batches, weights)
            )
        # un-shuffle back to item order (pad duplicates never referenced:
        # inv maps each item to its first occurrence)
        curve = curves.reshape(-1, n_prefix)[inv]
        y_pred = y_preds.reshape(-1, T)[inv]
        y_true = y_trues.reshape(-1, T)[inv]
        logits = logits.reshape(-1, W, T, T)[inv].reshape(-1, T, T)
        return EvalResult(
            loss=loss_sums.sum() / v.D,
            accuracy=curve[:, -1].mean(),
            curve=curve,
            y_pred=y_pred,
            y_true=y_true,
            logits=logits,
        )

    def _evaluate_scalars(self, state: TrainState, key: jax.Array,
                          hyper: Hyper, view, batch_size: int):
        """Metrics-only eval (no artifact tensors) — the vmap-friendly inner
        loop of the crossval sweep."""
        res = self._evaluate(state, key, hyper, view, batch_size)
        return res.loss, res.accuracy

    def _evaluate_per_subject(self, state: TrainState, key: jax.Array,
                              hyper: Hyper, view) -> EvalResult:
        """True per-subject AdaBN evaluation: one eval batch per subject, so
        batch statistics are re-estimated from that subject's windows only.

        This is the *intent* of the reference's AdaBN ("momentum = 0 and
        batch per subject", models.py:245) which its TaskWrapper never
        delivers — DataLoader shuffling mixes subjects into every batch.
        The eval item axis is (person, rep, group) row-major
        (load.py:233-240), so a subject's items are one contiguous slice —
        and the gathers must use *identity* index matrices (not the random
        task permutations) or each "subject" batch would pull windows from
        random subjects, defeating the per-subject batch statistics. Output
        rows are therefore in true (person, rep, group) item order.
        """
        del key  # deterministic: identity indexing, contiguous blocks
        v = view
        per_subject = v.D // v.n_people
        # batches = per-subject contiguous item blocks, no shuffling needed
        items = jnp.arange(v.D).reshape(v.n_people, per_subject)
        cfg = self.cfg
        W = cfg.prediction_window_size
        n_prefix = cfg.n_voting_cols
        T = v.n_tasks
        emg_rand = identity_permutations(T, v.D)
        glove_rand = identity_permutations(T, v.D_glove)

        def body(_, subj_items):
            emg_b = gather_eval_batch(v.emg_groups, emg_rand, subj_items)
            glove_b = gather_glove_batch(
                v.glove_flat, glove_rand, subj_items, v.D_glove
            )
            logits, _ = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                emg_b, glove_b, hyper.dp_emg, hyper.dp_glove, False,
                mutable=["batch_stats"],
            )
            loss = symmetric_contrastive_loss(logits)
            res = vote_from_logits(logits, window=W, n_prefix=n_prefix)
            return None, (loss, res.curve, res.y_pred, res.y_true,
                          logits.reshape(per_subject, W, T, T))

        _, (losses, curves, y_preds, y_trues, logits) = jax.lax.scan(
            body, None, items
        )
        curve = curves.reshape(-1, n_prefix)
        return EvalResult(
            loss=losses.mean(),
            accuracy=curve[:, -1].mean(),
            curve=curve,
            y_pred=y_preds.reshape(-1, T),
            y_true=y_trues.reshape(-1, T),
            logits=logits.reshape(-1, T, T),
        )

    def evaluate_per_subject(self, state, key, hyper, split="test") -> EvalResult:
        sig = "per_subject"
        if sig not in self._eval_jit:
            self._eval_jit[sig] = jax.jit(self._evaluate_per_subject)
        view = {"val": self.view_val, "test": self.view_test}[split]
        return self._eval_jit[sig](state, key, hyper, view)

    def evaluate(self, state, key, hyper, split="val",
                 batch_size: Optional[int] = None) -> EvalResult:
        # reference: val batches = bs, test batches = bs·8 (train.py:32,51)
        if batch_size is None:
            batch_size = self.batch_size if split == "val" else self.batch_size * 8
        sig = batch_size
        if sig not in self._eval_jit:
            self._eval_jit[sig] = jax.jit(
                partial(self._evaluate, batch_size=batch_size)
            )
        view = {"val": self.view_val, "test": self.view_test}[split]
        return self._eval_jit[sig](state, key, hyper, view)
