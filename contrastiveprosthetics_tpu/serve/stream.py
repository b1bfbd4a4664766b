"""Streaming sliding-window inference at prosthesis-control latency.

New capability (BASELINE.json config 5): the reference only evaluates
offline; this engine runs the full online pipeline as ONE jitted step per
10 ms control tick:

  raw 2 kHz block (20 samples × 12 ch) → stateful SOS bandpass (IIR state
  carried across ticks) → trailing window-11 RMS → (x−mean)/std normalize →
  EMG encoder → cosine scores against the (pre-encoded, subset-masked) class
  embeddings → majority vote over the last ``prediction_window_size`` frames.

Design notes vs the offline path:
  * The offline RMS window is *centered* (``uniform_filter1d``); a real-time
    system cannot see the future, so serving uses the trailing 11 filtered
    samples (5-sample ≙ 2.5 ms group delay difference, documented).
  * AdaBN needs batch statistics; a single streamed frame has none. Serve
    therefore runs the encoder with plain-BN running averages (train with
    ``--no_adabn``) or with a frozen calibration ``batch_stats``.
  * The subset restriction (the user's chosen grasp set, README.md:15) is a
    score mask — switching subsets is a host-side array update, no
    recompilation.

Perf note (v5e, marginal tick-chain cost, device-resident inputs):
1.2-1.5 µs/tick single-session on the fused Pallas tick chain
(ops/pallas_ops.py §3, the TPU default since its recorded A/B) vs
166-188 µs on the XLA chain — the XLA tick is bound by the 7-layer
encoder's sequential 1-row GEMMs re-streaming weights from HBM every
tick (unrolling the IIR scan was A/B'd there: −8 %, rejected). The
batched fused chain (§4) serves 64 sessions at 0.06-0.31 µs/session;
the vmapped XLA tick it replaced reads 2.6-3.5 µs/session.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveprosthetics_tpu.config import Config
from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
from contrastiveprosthetics_tpu.ops.signal import butter_bandpass_sos

# Process-wide verdict cache for the tuned-session-block compile probe
# (round 5): (n_sessions, census block, weight-chain signature) → winning
# tuned block, or 0 when every candidate failed to compile. One probe per
# geometry per process, no matter how many engines are constructed.
_TUNED_BLOCK_VERDICTS: dict = {}


@functools.lru_cache(maxsize=8)
def _calibration_pass(model: ContrastiveModel):
    """One jitted mutable forward: ``(variables, frames) -> batch_stats``.

    Built once per model (flax modules are hashable frozen dataclasses) and
    reused by every calibration call — sessions calibrated through the same
    model share one compiled program instead of re-jitting each time
    (jax.jit's shape cache handles differing recording lengths).
    """
    rng = jax.random.PRNGKey(0)  # encode_emg uses dropout rate 0.0; unused

    def one_pass(variables, frames):
        return model.apply(
            variables, frames, True,
            method=ContrastiveModel.encode_emg,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )[1]["batch_stats"]

    return jax.jit(one_pass)


def recalibrate_batch_stats(
    model: ContrastiveModel, variables: dict, frames: jax.Array,
    passes: int = 40,
) -> dict:
    """Online AdaBN: re-estimate every BatchNorm's running statistics from
    preprocessed calibration ``frames`` (T, emg_dim) — the reference's
    unimplemented TODO (models.py:18 "No code for the online mean/std at
    test time yet").

    Iterates mutable forwards: each pass moves the running averages toward
    the calibration batch (flax momentum 0.9), and because a deeper BN's
    input distribution depends on the shallower BNs' statistics, iterating
    is the correct fixed-point re-estimation. 40 passes ⇒ residual weight
    of the old stats ≈ 0.9⁴⁰ ≈ 1.5 %. Returns the new ``batch_stats``.
    """
    fwd = _calibration_pass(model)
    variables = dict(variables)
    for _ in range(passes):
        variables = dict(variables, batch_stats=fwd(variables, frames))
    return variables["batch_stats"]


class StreamCarry(NamedTuple):
    iir_state: jax.Array    # (n_sections, 2, emg_dim)
    tail: jax.Array         # (rms_window-1, emg_dim) last filtered samples
    votes: jax.Array        # (prediction_window_size,) recent per-frame preds
    n_seen: jax.Array       # frames seen so far (for vote warm-up)


class StreamingEngine:
    """Jitted per-tick inference with carried DSP state."""

    def __init__(
        self,
        cfg: Config,
        model: ContrastiveModel,
        variables: dict,
        emg_mean: np.ndarray,
        emg_std: np.ndarray,
        glove_prototypes: Optional[np.ndarray] = None,
        use_fused_encoder: Optional[bool] = None,
    ):
        """``use_fused_encoder``: run the tick's encoder+similarity as the
        single fused Pallas kernel (ops/pallas_ops.py §2) — the whole
        network's weights stream HBM→VMEM once per tick instead of one
        XLA op launch per layer. None → ON when running on TPU: the
        recorded v5e A/B (2026-08-18, bench phase_serve) measured the
        fused replay chain at 1.2-1.5 µs/tick marginal vs 166-173 µs for
        the XLA chain — ~115×. On CPU the kernel runs interpret-mode
        (test-only speed), so None resolves to OFF there.
        This engine's fold absorbs the (calibratable) batch_stats into the
        weights; the batched engine keeps PER-SESSION statistics over
        shared weights and has its own fused replay (pallas_ops §4:
        BN-free shared chain + per-session affine vectors).
        """
        if getattr(model, "adabn", False):
            # AdaBN layers normalize with *current-batch* statistics even in
            # eval (use_running_average=False); a single streamed frame has
            # zero variance, so the encoder output would collapse to the BN
            # bias and calibrated batch_stats would be silently ignored.
            raise ValueError(
                "StreamingEngine requires a plain-BN model (adabn=False): "
                "AdaBN ignores calibrated running statistics at inference. "
                "Train with --no_adabn and use calibrate() for "
                "subject-adapted statistics."
            )
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self._sos = jnp.asarray(
            butter_bandpass_sos(20, 450, cfg.hz), jnp.float32
        )
        self._mean = jnp.asarray(emg_mean, jnp.float32)
        self._std = jnp.asarray(emg_std, jnp.float32)
        from contrastiveprosthetics_tpu.ops.signal import INGEST_PRESCALE

        self._prescale = INGEST_PRESCALE  # python scalar: inlined, never streamed

        glove_rows = (
            jnp.asarray(glove_prototypes, jnp.float32)
            if glove_prototypes is not None
            else None
        )
        self._class_emb = model.apply(
            variables,
            glove_rows,
            False,
            method=ContrastiveModel.encode_classes,
            mutable=False,
        )  # (n_classes, d_e)

        # NOTE: weights are *arguments* of the jitted tick, not closure
        # constants — closed-over arrays are baked into the executable as
        # constants, which remote-attached TPUs re-stream on every dispatch
        # (~25 ms/call measured); argument arrays stay device-resident.
        self._dev_vars = jax.device_put(variables)
        self._dev_class_emb = jax.device_put(self._class_emb)
        if use_fused_encoder is None:  # auto: v5e A/B 1.5 vs 172 µs/tick
            from contrastiveprosthetics_tpu.ops.pallas_ops import on_tpu

            use_fused_encoder = on_tpu()
        self._use_fused = bool(use_fused_encoder)
        self._folded = self._fold() if self._use_fused else ()
        self._step = jax.jit(self._tick, donate_argnums=(0,))
        self._steps_jit = jax.jit(self._tick_chain, donate_argnums=(0,))
        if self._use_fused:
            from contrastiveprosthetics_tpu.ops.pallas_ops import (
                fused_tick_chain,
            )

            # donate the carry components (args 0-3), matching the XLA
            # chain's donate_argnums=(0,) — steps() promises donation on
            # both paths
            self._chain_jit = jax.jit(fused_tick_chain,
                                      static_argnums=(10,),
                                      donate_argnums=(0, 1, 2, 3))

    def _fold(self) -> tuple:
        """Device-resident folded matmul chain for the fused tick; re-run
        after every :meth:`calibrate` (the fold absorbs batch_stats)."""
        from contrastiveprosthetics_tpu.ops.pallas_ops import (
            fold_encoder_params_jit,
        )

        return tuple(jax.device_put(
            fold_encoder_params_jit(
                self.variables["params"],
                self.variables.get("batch_stats", {}),
                self._class_emb,
                dtype=getattr(self.model, "dtype", jnp.float32),
            )
        ))

    # ------------------------------------------------------------------ state
    def init_carry(self) -> StreamCarry:
        cfg = self.cfg
        return StreamCarry(
            iir_state=jnp.zeros((self._sos.shape[0], 2, cfg.emg_dim), jnp.float32),
            tail=jnp.zeros((cfg.rms_window - 1, cfg.emg_dim), jnp.float32),
            votes=jnp.zeros((cfg.prediction_window_size,), jnp.int32),
            n_seen=jnp.int32(0),
        )

    # ------------------------------------------------------------------- tick
    def _tick(self, carry: StreamCarry, raw_block: jax.Array,
              subset_mask: jax.Array, variables, class_emb, sos, mean, std,
              *folded):
        """``raw_block``: (factor=20, emg_dim) raw samples (10 ms).
        Returns (carry, per-frame pred, majority-vote pred, scores).
        ``folded`` (optional trailing arrays): the folded matmul chain —
        its presence statically selects the fused-kernel encoder."""
        cfg = self.cfg
        x = raw_block * self._prescale

        def iir_step(z, xn):
            y = xn
            new_z = []
            for k in range(sos.shape[0]):
                b0, b1, b2, _, a1, a2 = (sos[k, i] for i in range(6))
                yk = b0 * y + z[k, 0]
                z0 = b1 * y - a1 * yk + z[k, 1]
                z1 = b2 * y - a2 * yk
                new_z.append(jnp.stack([z0, z1]))
                y = yk
            return jnp.stack(new_z), y

        new_iir, filtered = jax.lax.scan(iir_step, carry.iir_state, x)

        # trailing window-11 RMS at block end
        window = jnp.concatenate([carry.tail, filtered], axis=0)[
            -cfg.rms_window :
        ]
        frame = jnp.sqrt(jnp.mean(jnp.square(window), axis=0))
        frame = (frame - mean) / std

        if folded:  # static at trace time: fused whole-encoder kernel
            from contrastiveprosthetics_tpu.ops.pallas_ops import (
                fused_encoder_logits,
                on_tpu,
            )

            scores = fused_encoder_logits(
                frame[None, :], folded, not on_tpu()
            )[0]  # (n_classes,)
        else:
            emb = self.model.apply(
                variables,
                frame[None, :],
                False,
                method=ContrastiveModel.encode_emg,
                mutable=False,
            )[0]  # (d_e,)

            scores = class_emb @ emb  # (n_classes,)
        neg = jnp.finfo(scores.dtype).min
        masked = jnp.where(subset_mask, scores, neg)
        pred = jnp.argmax(masked).astype(jnp.int32)

        votes = jnp.roll(carry.votes, -1).at[-1].set(pred)
        n_seen = jnp.minimum(
            carry.n_seen + 1, jnp.int32(cfg.prediction_window_size)
        )
        # majority vote over the valid suffix (ties → smallest class id)
        W = cfg.prediction_window_size
        valid = jnp.arange(W) >= (W - n_seen)
        counts = jnp.sum(
            jax.nn.one_hot(votes, class_emb.shape[0]) * valid[:, None],
            axis=0,
        )
        counts = jnp.where(subset_mask, counts, -1.0)
        vote = jnp.argmax(counts).astype(jnp.int32)

        new_carry = StreamCarry(new_iir, window[1:], votes, n_seen)
        return new_carry, pred, vote, masked

    def _tick_args(self, subset_mask):
        """(mask, variables, class_emb, sos, mean, std) — the shared tail
        of every tick dispatch; single source for step/steps."""
        if subset_mask is None:
            subset_mask = jnp.ones(
                (self._class_emb.shape[0],), dtype=bool
            )
        return (jnp.asarray(subset_mask), self._dev_vars,
                self._dev_class_emb, self._sos, self._mean, self._std,
                *self._folded)

    def step(self, carry: StreamCarry, raw_block, subset_mask=None):
        return self._step(
            carry,
            jnp.asarray(raw_block, jnp.float32),
            *self._tick_args(subset_mask),
        )

    def _tick_chain(self, carry: StreamCarry, blocks: jax.Array,
                    subset_mask: jax.Array, variables, class_emb, sos,
                    mean, std, *folded):
        """K ticks as ONE ``lax.scan`` dispatch — identical semantics to K
        sequential :meth:`_tick` calls (the scan body IS ``_tick``)."""

        def body(c, block):
            c, pred, vote, _ = self._tick(
                c, block, subset_mask, variables, class_emb, sos, mean, std,
                *folded
            )
            return c, (pred, vote)

        carry, (preds, votes) = jax.lax.scan(body, carry, blocks)
        return carry, preds, votes

    def steps(self, carry: StreamCarry, raw_blocks, subset_mask=None):
        """Process ``(K, factor, emg_dim)`` blocks in ONE device dispatch.

        Offline/batch replay path: same per-tick semantics as K ``step``
        calls, but the host↔device round trip is paid once per recording
        instead of once per 10 ms tick — essential on remote-attached
        devices where each dispatch+sync costs ~30 ms. ``carry`` is
        DONATED (thread the returned carry forward). Returns
        (carry, preds (K,), votes (K,))."""
        if self._use_fused:
            # whole chain as ONE kernel (ops/pallas_ops.py §3): weights
            # stream HBM→VMEM once per recording, DSP state lives in VMEM
            # scratch across the sequential tick grid
            from contrastiveprosthetics_tpu.ops.pallas_ops import on_tpu

            if subset_mask is None:
                subset_mask = jnp.ones(
                    (self._class_emb.shape[0],), dtype=bool
                )
            (iir, tail, votes, n_seen), preds, vote_preds = self._chain_jit(
                carry.iir_state, carry.tail, carry.votes, carry.n_seen,
                jnp.asarray(raw_blocks, jnp.float32),
                jnp.asarray(subset_mask), self._sos, self._mean, self._std,
                self._folded, not on_tpu(),
            )
            return (StreamCarry(iir, tail, votes, n_seen), preds,
                    vote_preds)
        return self._steps_jit(
            carry,
            jnp.asarray(raw_blocks, jnp.float32),
            *self._tick_args(subset_mask),
        )

    def preprocess_recording(self, raw_recording: np.ndarray) -> jax.Array:
        """Offline preprocessing of a raw 2 kHz recording (T, emg_dim) into
        normalized frames — the ingest pipeline (filter → RMS → downsample →
        normalize) applied to calibration data."""
        from contrastiveprosthetics_tpu.ops.signal import moving_rms, sosfilt

        raw = jnp.asarray(raw_recording, jnp.float32)
        filtered = sosfilt(self._sos, raw * self._prescale)
        frames = moving_rms(filtered, window=self.cfg.rms_window)
        frames = frames[:: self.cfg.factor]
        return (frames - self._mean) / self._std

    def calibrate(self, raw_recording: np.ndarray) -> None:
        """Online AdaBN at test time: re-estimate the BN running statistics
        from a calibration recording of the *current* user/session
        (:func:`recalibrate_batch_stats`). Subsequent streaming inference
        then normalizes with subject-adapted statistics — AdaBN semantics
        without needing batches at inference time."""
        frames = self.preprocess_recording(raw_recording)
        new_stats = recalibrate_batch_stats(self.model, self._dev_vars, frames)
        new_vars = dict(self._dev_vars, batch_stats=new_stats)
        self.variables = new_vars
        self._dev_vars = jax.device_put(new_vars)
        if self._use_fused:
            self._folded = self._fold()  # stats are baked into the fold

    def run(self, raw: np.ndarray, subset_mask=None):
        """Convenience: stream a whole recording (T, emg_dim); returns
        per-block (preds, votes). Uses the one-dispatch :meth:`steps`
        chain (per-tick ``step`` equality is pinned by
        tests/test_serve.py::test_steps_chain_matches_step_loop)."""
        cfg = self.cfg
        n_blocks = raw.shape[0] // cfg.factor
        blocks = np.asarray(
            raw[: n_blocks * cfg.factor], np.float32
        ).reshape(n_blocks, cfg.factor, -1)
        _, preds, votes = self.steps(self.init_carry(), blocks, subset_mask)
        return np.asarray(preds), np.asarray(votes)


class BatchedStreamingEngine:
    """Multi-session serving: ONE jitted tick serves ``n_sessions``
    prosthesis users concurrently on one chip — or across a chip mesh
    (``mesh=``), where the session axis is sharded over ``dp`` and
    capacity scales linearly with zero inter-chip collectives.

    Production shape: encoder parameters are shared across sessions while
    BatchNorm running statistics are PER-SESSION (each user gets their own
    ``calibrate_session`` — the online-AdaBN adaptation of
    :meth:`StreamingEngine.calibrate`), and each session carries its own
    DSP state, vote window, and grasp-subset mask. The per-tick step is the
    single-session ``_tick`` vmapped over the session axis, so the MXU sees
    one (S, d) GEMM per layer instead of S dispatches — per-session cost
    amortizes to microseconds.
    """

    def __init__(
        self,
        cfg: Config,
        model: ContrastiveModel,
        variables: dict,
        emg_mean: np.ndarray,
        emg_std: np.ndarray,
        n_sessions: int,
        glove_prototypes: Optional[np.ndarray] = None,
        mesh=None,
        use_fused_encoder: Optional[bool] = None,
        session_block: Optional[int] = None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``dp`` axis — the
        session axis is then sharded over it: each chip serves its own
        session slice inside ONE jitted tick, with zero inter-chip
        collectives (sessions are independent). Session capacity scales
        linearly with chips; ``n_sessions`` must divide by the ``dp``
        size. Parameters/class embeddings are replicated; per-session
        state (DSP carries, vote windows, BN statistics, subset masks) is
        sharded.

        ``use_fused_encoder``: run :meth:`steps` (the replay chain) as the
        ONE batched Pallas kernel (ops/pallas_ops.py §4) — the shared
        BN-free weight chain streams HBM→VMEM once per recording and each
        session applies its own calibrated BN statistics as per-session
        affine vectors. The session axis is tiled into VMEM-gated blocks
        inside the kernel (round 4), so there is no fused session limit:
        the weight chain loads once per call no matter how many blocks
        stream through. Under ``mesh=`` the kernel runs per chip via
        ``shard_map`` over ``dp`` (sessions are independent — zero
        collectives), each chip fusing its own session shard with the
        block gated per shard. None → ON when on TPU (recorded v5e A/B
        2026-08-18 geometry: 0.004-0.020 vs 0.19-0.23 ms/tick at 64
        sessions — 10-53×); on CPU the vmapped XLA chain. Per-tick
        :meth:`step` stays on the vmapped XLA tick either way.

        ``session_block``: rows per §4 session block. None (auto) starts
        from the largest sublane-aligned block the worst-case VMEM census
        admits — safe at ANY session count, because Mosaic's scoped-vmem
        need grows as the block COUNT shrinks (round-4 OOM dumps: Sb=56
        fits at J=586 blocks but overflows at J=74) — then, on TPU,
        COMPILE-PROBES the scan-optimal larger candidates (2×/1.75×
        census) on the first ``steps`` call and keeps the largest that
        compiles (round 5: the S=32768 optima are 56 → 6.76 and 64 →
        6.08 ms/tick vs 8.56 at census 32 — a 21-29 % win auto now
        captures where Mosaic admits it). An explicit value skips the
        probe; an over-budget explicit choice fails at Mosaic compile
        time, not here. Scan + guidance in docs/SCALING.md
        "Session-block tuning"."""
        if mesh is not None and n_sessions % mesh.shape["dp"] != 0:
            raise ValueError(
                f"n_sessions={n_sessions} must divide by the mesh dp size "
                f"{mesh.shape['dp']}"
            )
        if session_block is not None and session_block < 1:
            # a <=0 override would pass ceil_to_sublane unchanged and land
            # in the shared-chain-too-big fallback branch, whose diagnostic
            # blames VMEM instead of the bad parameter
            raise ValueError(
                f"session_block must be >= 1 (got {session_block}); pass "
                "None for the auto VMEM-census block"
            )
        self.n_sessions = n_sessions
        # the inner engine only supplies the XLA `_tick` for vmapping and
        # shared preprocessing/folding helpers — never its own fused chain
        self._single = StreamingEngine(
            cfg, model, variables, emg_mean, emg_std, glove_prototypes,
            use_fused_encoder=False,
        )
        self.cfg = cfg
        self._mesh = mesh
        # shared params; per-session batch_stats (initialized identical)
        stack = lambda x: jnp.broadcast_to(x, (n_sessions,) + x.shape)
        self._params = jax.device_put(
            {k: v for k, v in variables.items() if k != "batch_stats"}
        )
        self._batch_stats = self._place_sessions(
            jax.tree_util.tree_map(stack, variables.get("batch_stats", {}))
        )
        var_axes = {k: None for k in variables if k != "batch_stats"}
        var_axes["batch_stats"] = 0
        self._vmapped_tick = jax.vmap(
            self._single._tick,
            in_axes=(0, 0, 0, var_axes, None, None, None, None),
        )
        self._step = jax.jit(self._vmapped_tick, donate_argnums=(0,))
        self._steps_jit = jax.jit(self._tick_chain, donate_argnums=(0,))
        if use_fused_encoder is None:
            # auto: the recorded v5e A/B (2026-08-18, bench phase_serve)
            # measured the §4 fused replay at 0.004-0.020 ms/tick for 64
            # sessions vs 0.19-0.23 ms for the vmapped XLA chain. On
            # CPU the kernel runs interpret-mode, so auto resolves OFF;
            # over-VMEM-budget geometries also fall back (below).
            from contrastiveprosthetics_tpu.ops.pallas_ops import on_tpu

            auto = True
            use_fused_encoder = on_tpu()
        else:
            auto = False
        self._use_fused = bool(use_fused_encoder)
        self._sb_tuned_candidates: tuple = ()
        self._session_block_source: Optional[str] = None
        self._sb_census: Optional[int] = None
        if self._use_fused:
            from contrastiveprosthetics_tpu.ops.pallas_ops import (
                fold_encoder_params_shared_jit,
                fused_tick_chain_batched,
            )

            self._shared = tuple(self._replicate(
                fold_encoder_params_shared_jit(
                    self._params["params"],
                    self._single._class_emb,
                    dtype=getattr(model, "dtype", jnp.float32),
                )
            ))
            # VMEM gate (~16 MB/core) — round 4: the §4 kernel tiles the
            # session axis into blocks (grid = (blocks, ticks)), so the
            # budget bounds the session BLOCK size, not the session count:
            # the shared weight chain stays VMEM-resident across the whole
            # grid (one HBM read per call) while each block's carry
            # streams through scratch. Solve for the largest sublane-
            # aligned block whose per-block footprint fits; only a weight
            # chain that alone busts the budget still disables the kernel.
            from contrastiveprosthetics_tpu.ops.pallas_ops import (
                ceil_to_sublane,
            )

            # under a mesh the kernel runs per chip on its session shard
            # (shard_map over dp), so the budget applies to the SHARD
            n_local = (n_sessions // mesh.shape["dp"]
                       if mesh is not None else n_sessions)
            D = cfg.emg_dim
            W, C = cfg.prediction_window_size, self._single._class_emb.shape[0]
            n_sec = self._single._sos.shape[0]
            tail_rows = cfg.rms_window - 1
            n_layers = (len(self._shared) - 1) // 2
            aff_width = sum(
                self._shared[2 * j].shape[1] for j in range(n_layers - 1)
            )
            # per-session words resident per block: carry quintuples for
            # IIR/tail/one-hot, filt/win scratch, the double-buffered tick
            # block + (a, c) affines + masks, and the pred/vote blocks.
            # The ×5 carry multiplier is the WORST case and deliberately
            # so: Mosaic's scoped-vmem need varies with the session-block
            # COUNT J, not just the block size (round-4 OOM dumps: Sb=56
            # fits at J=586 but overflows 16.00 MB by 3.6 MB at J=74 and
            # by 340 KB at J=293 — small-J grids get deeper cross-block
            # prefetch windows), so auto must hold at every S. This
            # census (block 32 at reference width) compiled and ran at
            # every probed S ∈ {1024..65536}; larger measured-optimal
            # blocks (56 → 6.76 ms, 64 → 6.08 ms at S=32768 vs 8.56 at
            # 32) are opt-in via ``session_block`` — see the scan in
            # docs/SCALING.md.
            per_sess_words = (
                5 * (n_sec * 2 * D + tail_rows * D + W * C)
                + (3 * cfg.factor + tail_rows) * D
                + 4 * aff_width + 2 * C + 4
            )
            shared_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                               for a in self._shared)
            budget = 14 << 20  # leave Mosaic headroom under ~16 MB VMEM
            block_words = (budget - shared_bytes) // 4
            sb_max = int(block_words // per_sess_words) // 8 * 8
            self._session_block = min(max(sb_max, 0),
                                      ceil_to_sublane(n_local))
            if session_block is not None:
                # explicit expert override: trust it up to the shard size
                # (an over-budget choice fails loudly at Mosaic compile)
                self._session_block = min(ceil_to_sublane(session_block),
                                          ceil_to_sublane(n_local))
            if self._session_block == 0 and auto:
                # auto geometry fallback — warn, don't hide it: the XLA
                # chain is 10-50× slower per tick and the operator has no
                # other signal that the fused path is not running
                import sys

                print(
                    "BatchedStreamingEngine: fused tick chain auto-disabled"
                    f" — the shared weight chain (~{shared_bytes / 2**20:.1f}"
                    f" MB) leaves no room for even an 8-session block under"
                    f" the ~{budget / 2**20:.0f} MB VMEM budget; falling "
                    "back to the vmapped XLA tick chain (slower per tick). "
                    "Use a bfloat16 model dtype (halves the weight chain) "
                    "to re-enable.",
                    file=sys.stderr,
                )
                self._use_fused = False
                self._shared = ()
            elif self._session_block == 0:
                raise ValueError(
                    f"batched fused tick chain: the shared weight chain "
                    f"(~{shared_bytes / 2**20:.1f} MB) leaves no room for "
                    f"even an 8-session block under the ~{budget / 2**20:.0f}"
                    " MB VMEM budget: use a bfloat16 model dtype (halves "
                    "the weight chain) or drop use_fused_encoder (the "
                    "vmapped XLA tick has no session limit)"
                )
            # Round-5 tuned-block candidates (VERDICT r4 task 4): the
            # census block is safe at every S but measured 21 % slower at
            # the 32,768-session capacity point than the scan optima
            # (56 → 6.76, 64 → 6.08 vs 8.56 ms/tick at census 32).
            # Larger blocks cannot be promoted statically — Mosaic's
            # scoped-vmem need grows as the block count J shrinks, so the
            # same Sb that fits at one S fails to compile at another
            # (docs/serve_phase_r04_sb56.json). Auto therefore records
            # candidates here (2× and 1.75× census, descending) and
            # COMPILE-PROBES them lazily on the first fused steps() call;
            # the first to compile wins, census is the fallback.
            self._session_block_source = (
                "override" if session_block is not None else "census")
            if (session_block is None and self._use_fused
                    and self._session_block > 0):
                cap = ceil_to_sublane(n_local)
                cands = []
                for c in (2 * self._session_block,
                          7 * self._session_block // 4 // 8 * 8):
                    c = min(ceil_to_sublane(c), cap)
                    if c > self._session_block and c not in cands:
                        cands.append(c)
                self._sb_tuned_candidates = tuple(
                    sorted(cands, reverse=True))
        if self._use_fused:
            self._refresh_affines()
            if mesh is None:
                self._chain_b_jit = jax.jit(
                    fused_tick_chain_batched,
                    static_argnums=(11, 12),
                    donate_argnums=(0, 1, 2, 3),
                )
            else:
                self._chain_b_jit = self._build_sharded_chain(
                    mesh, fused_tick_chain_batched
                )

    def _maybe_probe_tuned_block(self, args) -> None:
        """Resolve the auto session block via compile probe (round 5).

        AOT lower+compile each tuned candidate (largest first) — compile
        verdict only: nothing executes, donated buffers are untouched.
        The first candidate that compiles becomes the session block; if
        every candidate hits Mosaic's scoped-vmem wall, the worst-case
        census block stands. Verdicts are cached process-wide per
        (n_sessions, census block, weight-chain signature) so repeated
        engines pay one probe. Interpret-mode (CPU) engines skip probing
        — no Mosaic compiler, nothing to gain — unless
        CPTPU_PROBE_TUNED_INTERPRET=1 (test hook)."""
        import os
        import sys

        from contrastiveprosthetics_tpu.ops.pallas_ops import on_tpu

        cands, self._sb_tuned_candidates = self._sb_tuned_candidates, ()
        if not on_tpu() and not os.environ.get(
                "CPTPU_PROBE_TUNED_INTERPRET"):
            return
        self._sb_census = self._session_block
        key = self._verdict_key()
        verdict = _TUNED_BLOCK_VERDICTS.get(key)
        if verdict is None:
            verdict = 0
            for sb in cands:
                try:
                    self._lower_compile_probe(args, sb)
                except Exception as e:
                    print(
                        f"BatchedStreamingEngine: tuned session_block={sb}"
                        f" failed to compile at S={self.n_sessions} "
                        f"({str(e)[:160]}); "
                        + ("trying the next candidate"
                           if sb != cands[-1] else "keeping the census "
                           f"block {self._session_block}"),
                        file=sys.stderr,
                    )
                    continue
                verdict = sb
                break
            _TUNED_BLOCK_VERDICTS[key] = verdict
        if verdict:
            self._session_block = verdict
            self._session_block_source = "tuned-probe"

    def _verdict_key(self):
        return (self.n_sessions, self._sb_census,
                tuple((tuple(a.shape), str(a.dtype))
                      for a in self._shared))

    def _lower_compile_probe(self, args, sb: int) -> None:
        """AOT lower+compile of the fused chain at session block ``sb``."""
        from contrastiveprosthetics_tpu.ops.pallas_ops import on_tpu

        if self._mesh is None:
            self._chain_b_jit.lower(*args, not on_tpu(), sb).compile()
        else:
            # the sharded chain reads self._session_block at trace time
            prev = self._session_block
            self._session_block = sb
            try:
                self._chain_b_jit.lower(*args).compile()
            finally:
                self._session_block = prev

    def _refresh_affines(self) -> None:
        """Per-session BN affine vectors for the §4 kernel; re-derived
        whenever any session's statistics change (calibrate_session).
        Leading axis is the session axis → sharded over dp on a mesh."""
        from contrastiveprosthetics_tpu.ops.pallas_ops import (
            session_bn_affines_jit,
        )

        self._affines = tuple(self._place_sessions(session_bn_affines_jit(
            self._params["params"], self._batch_stats
        )))
        self._affines_dirty = False

    def _replicate(self, tree):
        """device_put replicated over the mesh (single-chip: plain put)."""
        if self._mesh is None:
            return jax.device_put(tree)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            tree,
            jax.tree_util.tree_map(
                lambda _: NamedSharding(self._mesh, P()), tree
            ),
        )

    def _build_sharded_chain(self, mesh, fused_tick_chain_batched):
        """The §4 fused chain per chip: ``shard_map`` over ``dp`` with the
        session axis sharded and the weight chain replicated — sessions
        are independent, so the program has ZERO collectives and each
        chip runs the whole-recording kernel on its own session shard
        (same formulation as parallel/spmd.py's config-sharded crossval).
        The returned jit matches the single-chip chain's donation; the
        interpret flag is baked at build time (CPU meshes run the kernel
        interpret-mode, exactly like the single-chip tests)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from contrastiveprosthetics_tpu.ops.pallas_ops import on_tpu

        interpret = not on_tpu()
        sess = lambda nd: P(*(("dp",) + (None,) * (nd - 1)))
        in_specs = (
            sess(4),                    # iir_state (S, n_sec, 2, D)
            sess(3),                    # tail (S, rms_window-1, D)
            sess(2),                    # votes (S, W)
            sess(1),                    # n_seen (S,)
            P(None, "dp", None, None),  # blocks (K, S, factor, D)
            sess(2),                    # subset masks (S, C)
            P(), P(), P(),              # sos, mean, std (replicated)
            tuple(P() for _ in self._shared),
            tuple(sess(2) for _ in self._affines),
        )
        out_specs = (
            (sess(4), sess(3), sess(2), sess(1)),  # carry
            P(None, "dp"),              # per-tick preds (K, S)
            P(None, "dp"),              # per-tick votes (K, S)
        )

        def local(iir, tail, votes, n_seen, blocks, masks, sos, mean, std,
                  shared, affines):
            return fused_tick_chain_batched(
                iir, tail, votes, n_seen, blocks, masks, sos, mean, std,
                shared, affines, interpret, self._session_block,
            )

        return jax.jit(
            shard_map(local, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False),
            donate_argnums=(0, 1, 2, 3),
        )

    def _place_sessions(self, tree):
        """Shard the leading (session) axis over the mesh's dp dimension;
        single-chip engines just device_put."""
        if self._mesh is None:
            return jax.device_put(tree)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            tree,
            jax.tree_util.tree_map(
                lambda leaf: NamedSharding(
                    self._mesh, P(*(("dp",) + (None,) * (leaf.ndim - 1)))
                ),
                tree,
            ),
        )

    def init_carries(self) -> StreamCarry:
        one = self._single.init_carry()
        return self._place_sessions(
            jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(
                    x, (self.n_sessions,) + x.shape
                ), one
            )
        )

    def calibrate_session(self, i: int, raw_recording: np.ndarray) -> None:
        """Re-estimate session ``i``'s BN statistics from its own
        calibration recording (online AdaBN, per user).

        All sessions share one compiled calibration program (the
        lru-cached jit in :func:`recalibrate_batch_stats`): calibrating N
        sessions costs one compile, not N — essential at the hundreds of
        sessions/chip the batched tick supports."""
        variables = dict(self._params)
        variables["batch_stats"] = jax.tree_util.tree_map(
            lambda x: x[i], self._batch_stats
        )
        frames = self._single.preprocess_recording(raw_recording)
        new_stats = recalibrate_batch_stats(
            self._single.model, variables, frames
        )
        self._batch_stats = jax.tree_util.tree_map(
            lambda all_, new: all_.at[i].set(new), self._batch_stats, new_stats
        )
        if self._use_fused:
            # lazy: calibrating S sessions in a loop would otherwise pay
            # S dispatches; steps() re-derives the affines once when dirty
            self._affines_dirty = True

    def step(self, carries: StreamCarry, raw_blocks, subset_masks=None):
        """``raw_blocks``: (n_sessions, factor, emg_dim); ``subset_masks``:
        (n_sessions, n_classes) bool or None (all classes). Returns
        (carries, per-frame preds (S,), vote preds (S,), scores (S, C)).

        ``carries`` is DONATED (its buffers are consumed in place, like the
        single-session ``step``): always thread the returned carries
        forward and never reuse a carries value after passing it in — keep
        a copy (``jax.tree_util.tree_map(jnp.copy, carries)``) if you need
        to replay a tick."""
        return self._step(
            carries,
            self._place_sessions(jnp.asarray(raw_blocks, jnp.float32)),
            *self._tick_args(subset_masks),
        )

    def _tick_args(self, subset_masks):
        """(masks, variables, class_emb, sos, mean, std) — the shared tail
        of every batched tick dispatch (per-session masks sharded, shared
        params + per-session batch_stats rebuilt); single source for
        step/steps."""
        C = self._single._class_emb.shape[0]
        if subset_masks is None:
            subset_masks = jnp.ones((self.n_sessions, C), dtype=bool)
        variables = dict(self._params)
        variables["batch_stats"] = self._batch_stats
        return (
            self._place_sessions(jnp.asarray(subset_masks)),
            variables,
            self._single._dev_class_emb,
            self._single._sos,
            self._single._mean,
            self._single._std,
        )

    def _tick_chain(self, carries, blocks_seq, subset_masks, variables,
                    class_emb, sos, mean, std):
        """K multi-session ticks as ONE ``lax.scan`` dispatch; the scan
        body is the same vmapped tick ``step`` runs."""

        def body(c, blocks):
            c, preds, votes, _ = self._vmapped_tick(
                c, blocks, subset_masks, variables, class_emb, sos, mean, std
            )
            return c, (preds, votes)

        carries, (preds, votes) = jax.lax.scan(body, carries, blocks_seq)
        return carries, preds, votes

    def steps(self, carries: StreamCarry, raw_blocks_seq, subset_masks=None):
        """Replay ``(K, n_sessions, factor, emg_dim)`` blocks in ONE
        dispatch (see :meth:`StreamingEngine.steps`). ``carries`` is
        DONATED. Returns (carries, preds (K, S), votes (K, S))."""
        blocks_seq = jnp.asarray(raw_blocks_seq, jnp.float32)
        if self._use_fused:
            # whole multi-session replay as ONE kernel (pallas_ops §4):
            # shared weights + per-session BN affines stream HBM→VMEM once
            # per recording; per-session DSP state lives in VMEM scratch.
            # On a mesh the jit is the shard_map-wrapped per-chip kernel
            # (session axis sharded; interpret flag baked at build time).
            from contrastiveprosthetics_tpu.ops.pallas_ops import on_tpu

            if self._affines_dirty:
                self._refresh_affines()
            C = self._single._class_emb.shape[0]
            if subset_masks is None:
                subset_masks = jnp.ones((self.n_sessions, C), dtype=bool)
            masks = self._place_sessions(jnp.asarray(subset_masks))
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                blocks_seq = jax.device_put(
                    blocks_seq,
                    NamedSharding(self._mesh, P(None, "dp", None, None)),
                )
            args = (
                carries.iir_state, carries.tail, carries.votes,
                carries.n_seen, blocks_seq, masks, self._single._sos,
                self._single._mean, self._single._std,
                self._shared, self._affines,
            )
            if self._sb_tuned_candidates:
                self._maybe_probe_tuned_block(args)
            call = (
                (lambda: self._chain_b_jit(*args))
                if self._mesh is not None
                else (lambda: self._chain_b_jit(
                    *args, not on_tpu(), self._session_block))
            )
            try:
                (iir, tail, votes, n_seen), preds, vote_preds = call()
            except Exception as e:
                # Execution-time fallback (round 5): the compile probe
                # runs at the FIRST call's tick count, but Mosaic's
                # scoped-vmem verdict can differ at another K (observed:
                # S=1024 Sb=64 compiled at K=3, HTTP 500 at K=10), and a
                # tuned block can also lose at execute time
                # (RESOURCE_EXHAUSTED at S=65536). A probe-promoted
                # block must never sink the engine: demote to the census
                # block, poison the cached verdict, retry once. Explicit
                # overrides still fail loudly.
                if (self._session_block_source != "tuned-probe"
                        or self._sb_census is None):
                    raise
                import sys

                print(
                    f"BatchedStreamingEngine: tuned session_block="
                    f"{self._session_block} failed at call time "
                    f"({str(e)[:160]}); demoting to the census block "
                    f"{self._sb_census}",
                    file=sys.stderr,
                )
                _TUNED_BLOCK_VERDICTS[self._verdict_key()] = 0
                self._session_block = self._sb_census
                self._session_block_source = "census(runtime-fallback)"
                (iir, tail, votes, n_seen), preds, vote_preds = call()
            return (StreamCarry(iir, tail, votes, n_seen), preds,
                    vote_preds)
        if self._mesh is not None:
            # session axis is axis 1 here (time leads): shard it over dp
            from jax.sharding import NamedSharding, PartitionSpec as P

            blocks_seq = jax.device_put(
                blocks_seq,
                NamedSharding(self._mesh, P(None, "dp", None, None)),
            )
        return self._steps_jit(
            carries,
            blocks_seq,
            *self._tick_args(subset_masks),
        )
