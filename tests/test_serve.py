"""Streaming engine: stateful DSP equivalence with the offline pipeline and
subset masking."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG
from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
from contrastiveprosthetics_tpu.ops.signal import butter_bandpass_sos, sosfilt
from contrastiveprosthetics_tpu.serve.stream import StreamingEngine

CFG = DEFAULT_CONFIG


@pytest.fixture(scope="module")
def engine():
    model = ContrastiveModel(d_e=16, adabn=False, n_classes=CFG.max_tasks)
    key = jax.random.PRNGKey(0)
    emg = jnp.zeros((2, CFG.max_tasks, 12))
    glove = jnp.zeros((2, CFG.max_tasks, 20))
    variables = model.init(
        {"params": key, "dropout": key}, emg, glove, 0.5, 0.5, True
    )
    return StreamingEngine(
        CFG, model, variables,
        emg_mean=np.zeros(12, np.float32),
        emg_std=np.ones(12, np.float32),
    )


def test_streaming_rejects_adabn_model():
    """AdaBN normalizes single streamed frames against their own
    (zero-variance) statistics — the engine must refuse such models."""
    model = ContrastiveModel(d_e=16, adabn=True, n_classes=CFG.max_tasks)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, CFG.max_tasks, 12)),
        jnp.zeros((2, CFG.max_tasks, 20)),
        0.5, 0.5, True,
    )
    with pytest.raises(ValueError, match="adabn"):
        StreamingEngine(
            CFG, model, variables,
            emg_mean=np.zeros(12, np.float32),
            emg_std=np.ones(12, np.float32),
        )


def test_stateful_iir_matches_batch_filter(engine, rng):
    """Block-wise stateful filtering must equal one-shot sosfilt."""
    raw = rng.standard_normal((400, 12)).astype(np.float32)
    sos = butter_bandpass_sos(20, 450, CFG.hz)
    want = np.asarray(
        sosfilt(jnp.asarray(sos), jnp.asarray(raw * 2.0**10))
    )
    carry = engine.init_carry()
    got_tails = []
    for i in range(400 // 20):
        carry, _, _, _ = engine.step(carry, raw[i * 20 : (i + 1) * 20])
        got_tails.append(np.asarray(carry.tail[-1]))
    # carry.tail[-1] is the last filtered sample of each block
    want_tails = want[19::20]
    np.testing.assert_allclose(
        np.stack(got_tails), want_tails, rtol=1e-3, atol=1e-2
    )


def test_subset_mask_restricts_predictions(engine, rng):
    raw = rng.standard_normal((500, 12)).astype(np.float32) * 1e-4
    mask = np.zeros(41, bool)
    allowed = [0, 7, 23]
    mask[allowed] = True
    preds, votes = engine.run(raw, subset_mask=mask)
    assert set(preds.tolist()) <= set(allowed)
    assert set(votes.tolist()) <= set(allowed)


def test_steps_chain_matches_step_loop(engine, rng):
    """The one-dispatch ``steps`` scan must be tick-for-tick identical to a
    per-block ``step`` loop (it is the same ``_tick`` body under
    ``lax.scan``) — the contract ``run`` and the bench rely on."""
    K = 8
    raw = rng.standard_normal((K * 20, 12)).astype(np.float32)
    mask = np.zeros(41, bool)
    mask[[1, 5, 9]] = True

    carry = engine.init_carry()
    want_p, want_v = [], []
    for i in range(K):
        carry, p, v, _ = engine.step(carry, raw[i * 20:(i + 1) * 20], mask)
        want_p.append(int(p))
        want_v.append(int(v))
    loop_carry = carry

    chain_carry, preds, votes = engine.steps(
        engine.init_carry(), raw.reshape(K, 20, 12), mask
    )
    assert preds.tolist() == want_p
    assert votes.tolist() == want_v
    for a, b in zip(
        jax.tree_util.tree_leaves(chain_carry),
        jax.tree_util.tree_leaves(loop_carry),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_vote_stabilizes(engine, rng):
    raw = np.tile(rng.standard_normal((1, 12)).astype(np.float32), (1000, 1))
    preds, votes = engine.run(raw)
    # constant input → constant per-frame prediction → vote equals it
    assert (preds[30:] == preds[30]).all()
    assert (votes[60:] == preds[30]).all()


def test_calibrate_adapts_bn_stats(engine, rng):
    """Online AdaBN: calibration on a shifted-distribution recording must
    change the running statistics and subsequent predictions' scores."""
    import jax

    raw = (rng.standard_normal((2010, 12)) * 5e-4 + 2e-4).astype(np.float32)
    before = jax.tree_util.tree_leaves(engine.variables.get("batch_stats", {}))
    block = rng.standard_normal((20, 12)).astype(np.float32) * 1e-4
    c0 = engine.init_carry()
    _, _, _, scores_before = engine.step(c0, block)

    engine.calibrate(raw)

    after = jax.tree_util.tree_leaves(engine.variables["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )
    assert changed
    c1 = engine.init_carry()
    _, _, _, scores_after = engine.step(c1, block)
    assert not np.allclose(
        np.asarray(scores_before), np.asarray(scores_after), atol=1e-6
    )


def test_batched_engine_matches_single_sessions(engine, rng):
    """BatchedStreamingEngine (one vmapped tick for S sessions) must produce
    exactly what S independent single-session engines produce."""
    from contrastiveprosthetics_tpu.serve.stream import BatchedStreamingEngine

    S, n_blocks = 3, 6
    batched = BatchedStreamingEngine(
        CFG, engine.model, engine.variables,
        emg_mean=np.zeros(12, np.float32),
        emg_std=np.ones(12, np.float32),
        n_sessions=S,
    )
    raws = rng.standard_normal((S, n_blocks * CFG.factor, 12)).astype(np.float32)
    masks = np.ones((S, CFG.max_tasks), bool)
    masks[1, 20:] = False  # session 1 restricts its grasp subset

    carries = batched.init_carries()
    batched_votes = []
    for b in range(n_blocks):
        blocks = raws[:, b * CFG.factor : (b + 1) * CFG.factor]
        carries, preds, votes, scores = batched.step(carries, blocks, masks)
        batched_votes.append(np.asarray(votes))
    batched_votes = np.stack(batched_votes, axis=1)  # (S, n_blocks)

    for s in range(S):
        _, votes_s = engine.run(raws[s], subset_mask=masks[s])
        np.testing.assert_array_equal(batched_votes[s], votes_s)
    # the restricted session never predicts outside its subset
    assert (batched_votes[1] < 20).all()

    # the one-dispatch batched chain reproduces the per-tick loop
    blocks_seq = raws.reshape(S, n_blocks, CFG.factor, 12).transpose(
        1, 0, 2, 3
    )
    _, _, chain_votes = batched.steps(
        batched.init_carries(), blocks_seq, masks
    )
    np.testing.assert_array_equal(np.asarray(chain_votes).T, batched_votes)


def test_batched_per_session_calibration_is_isolated(engine, rng):
    """calibrate_session(i) must change session i's outputs and ONLY
    session i's (per-user AdaBN statistics are independent)."""
    from contrastiveprosthetics_tpu.serve.stream import BatchedStreamingEngine

    S = 2
    batched = BatchedStreamingEngine(
        CFG, engine.model, engine.variables,
        emg_mean=np.zeros(12, np.float32),
        emg_std=np.ones(12, np.float32),
        n_sessions=S,
    )
    raw = rng.standard_normal((4 * CFG.factor, 12)).astype(np.float32)

    def scores_now():
        carries = batched.init_carries()
        _, _, _, scores = batched.step(
            carries, np.stack([raw[: CFG.factor]] * S)
        )
        return np.asarray(scores)

    before = scores_now()
    np.testing.assert_allclose(before[0], before[1], rtol=1e-6)

    calib = (rng.standard_normal((3000, 12)) * 5 + 2).astype(np.float32)
    batched.calibrate_session(1, calib)
    after = scores_now()
    np.testing.assert_allclose(after[0], before[0], rtol=1e-6)  # untouched
    assert np.abs(after[1] - before[1]).max() > 1e-4  # adapted


def test_session_calibration_shares_one_compiled_program(engine, rng):
    """Calibrating N sessions must reuse ONE jitted calibration program
    (stream.recalibrate_batch_stats lru-caches the per-model jit) —
    round-1 built a throwaway engine + fresh jit per session."""
    from contrastiveprosthetics_tpu.serve.stream import (
        BatchedStreamingEngine,
        _calibration_pass,
    )

    batched = BatchedStreamingEngine(
        CFG, engine.model, engine.variables,
        emg_mean=np.zeros(12, np.float32),
        emg_std=np.ones(12, np.float32),
        n_sessions=3,
    )
    calib = (rng.standard_normal((2000, 12)) * 3 + 1).astype(np.float32)
    misses0 = _calibration_pass.cache_info().misses
    for s in range(3):
        batched.calibrate_session(s, calib)
    # one jit construction at most (0 if another test already built it for
    # this model); never one per session
    assert _calibration_pass.cache_info().misses - misses0 <= 1


def _fresh_engine_pair(**kw):
    """Two engines over identical fresh variables: XLA tick vs fused-kernel
    tick (narrow net keeps CPU interpret mode fast)."""
    model = ContrastiveModel(
        d_e=16, adabn=False, n_classes=CFG.max_tasks, n_linear=2, hidden=64
    )
    key = jax.random.PRNGKey(11)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, CFG.max_tasks, 12)),
        jnp.zeros((2, CFG.max_tasks, 20)),
        0.5, 0.5, True,
    )
    mk = lambda fused: StreamingEngine(
        CFG, model, variables,
        emg_mean=np.zeros(12, np.float32),
        emg_std=np.ones(12, np.float32),
        use_fused_encoder=fused, **kw,
    )
    return mk(False), mk(True)


def test_fused_tick_matches_xla_tick(rng):
    eng, eng_f = _fresh_engine_pair()
    raw = rng.standard_normal((200, 12)).astype(np.float32)
    c, c_f = eng.init_carry(), eng_f.init_carry()
    for i in range(10):
        block = raw[i * 20 : (i + 1) * 20]
        c, pred, vote, scores = eng.step(c, block)
        c_f, pred_f, vote_f, scores_f = eng_f.step(c_f, block)
        assert int(pred_f) == int(pred)
        assert int(vote_f) == int(vote)
        np.testing.assert_allclose(
            np.asarray(scores_f), np.asarray(scores), rtol=2e-4, atol=2e-5
        )


def test_fused_tick_refolds_after_calibration(rng):
    """calibrate() re-estimates batch_stats; the fused fold must absorb the
    NEW statistics (stale folds would silently keep the old ones)."""
    eng, eng_f = _fresh_engine_pair()
    cal = rng.standard_normal((2000, 12)).astype(np.float32) * 3.0 + 1.0
    eng.calibrate(cal)
    eng_f.calibrate(cal)
    raw = rng.standard_normal((100, 12)).astype(np.float32)
    _, preds, votes = eng.steps(eng.init_carry(), raw.reshape(5, 20, 12))
    _, preds_f, votes_f = eng_f.steps(
        eng_f.init_carry(), raw.reshape(5, 20, 12)
    )
    np.testing.assert_array_equal(np.asarray(preds_f), np.asarray(preds))
    np.testing.assert_array_equal(np.asarray(votes_f), np.asarray(votes))


def _fresh_batched_pair(S, **kw):
    """Two batched engines over identical fresh variables: vmapped XLA
    chain vs the §4 batched fused kernel (narrow net: CPU interpret)."""
    from contrastiveprosthetics_tpu.serve.stream import BatchedStreamingEngine

    model = ContrastiveModel(
        d_e=16, adabn=False, n_classes=CFG.max_tasks, n_linear=2, hidden=64
    )
    key = jax.random.PRNGKey(13)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, CFG.max_tasks, 12)),
        jnp.zeros((2, CFG.max_tasks, 20)),
        0.5, 0.5, True,
    )
    mk = lambda fused: BatchedStreamingEngine(
        CFG, model, variables,
        emg_mean=np.zeros(12, np.float32),
        emg_std=np.ones(12, np.float32),
        n_sessions=S,
        use_fused_encoder=fused, **kw,
    )
    return mk(False), mk(True)


def test_batched_fused_chain_matches_xla_steps(rng):
    """The §4 one-kernel batched replay must reproduce the vmapped XLA
    scan tick-for-tick — with per-session CALIBRATED statistics (each
    session's own BN affines), per-session subset masks, the vote warm-up,
    and continuation from a threaded carry."""
    S, K = 3, 12
    eng, eng_f = _fresh_batched_pair(S)
    # make the per-session statistics actually differ: calibrate session 1
    # on a shifted distribution (the per-user online-AdaBN path)
    calib = (rng.standard_normal((2000, 12)) * 4 + 2).astype(np.float32)
    eng.calibrate_session(1, calib)
    eng_f.calibrate_session(1, calib)

    masks = np.ones((S, CFG.max_tasks), bool)
    masks[2, 15:] = False  # session 2 restricts its grasp subset
    blocks = (rng.standard_normal((K, S, CFG.factor, 12)) * 2.0).astype(
        np.float32
    )

    c_x, c_f = eng.init_carries(), eng_f.init_carries()
    for chunk in (blocks[:5], blocks[5:]):  # two chunks: pins the carry
        c_x, p_x, v_x = eng.steps(c_x, chunk, masks)
        c_f, p_f, v_f = eng_f.steps(c_f, chunk, masks)
        np.testing.assert_array_equal(np.asarray(p_f), np.asarray(p_x))
        np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_x))
    np.testing.assert_allclose(
        np.asarray(c_f.iir_state), np.asarray(c_x.iir_state),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(c_f.tail), np.asarray(c_x.tail), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(c_f.votes), np.asarray(c_x.votes)
    )
    np.testing.assert_array_equal(
        np.asarray(c_f.n_seen), np.asarray(c_x.n_seen)
    )
    assert set(np.asarray(p_f)[:, 2].tolist()) <= set(range(15))


def test_batched_fused_recalibration_refreshes_affines(rng):
    """calibrate_session on a FUSED engine must change that session's
    outputs (stale affines would silently keep the old statistics) and
    only that session's."""
    S = 2
    eng, eng_f = _fresh_batched_pair(S)
    blocks = (rng.standard_normal((4, S, CFG.factor, 12)) * 2.0).astype(
        np.float32
    )
    _, _, before = eng_f.steps(eng_f.init_carries(), blocks)
    before = np.asarray(before)

    calib = (rng.standard_normal((2000, 12)) * 5 + 3).astype(np.float32)
    eng.calibrate_session(0, calib)
    eng_f.calibrate_session(0, calib)
    _, _, after_f = eng_f.steps(eng_f.init_carries(), blocks)
    _, _, after_x = eng.steps(eng.init_carries(), blocks)
    after_f = np.asarray(after_f)
    np.testing.assert_array_equal(after_f, np.asarray(after_x))
    np.testing.assert_array_equal(after_f[:, 1], before[:, 1])  # untouched


def test_batched_fused_bf16_fold_produces_valid_votes(rng):
    """A bfloat16 model dtype gives the §4 kernel a bf16 shared weight
    chain (half the VMEM + HBM streaming); outputs must stay valid class
    ids within the per-session subsets."""
    from contrastiveprosthetics_tpu.serve.stream import BatchedStreamingEngine

    S = 2
    model = ContrastiveModel(
        d_e=16, adabn=False, n_classes=CFG.max_tasks, n_linear=2,
        hidden=64, dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(5)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, CFG.max_tasks, 12)),
        jnp.zeros((2, CFG.max_tasks, 20)),
        0.5, 0.5, True,
    )
    eng = BatchedStreamingEngine(
        CFG, model, variables,
        emg_mean=np.zeros(12, np.float32),
        emg_std=np.ones(12, np.float32),
        n_sessions=S,
        use_fused_encoder=True,
    )
    assert eng._shared[0].dtype == jnp.bfloat16  # fold follows model dtype
    masks = np.zeros((S, CFG.max_tasks), bool)
    masks[0, [3, 11]] = True
    masks[1, [7, 20, 33]] = True
    blocks = (rng.standard_normal((6, S, CFG.factor, 12)) * 2.0).astype(
        np.float32
    )
    _, preds, votes = eng.steps(eng.init_carries(), blocks, masks)
    preds, votes = np.asarray(preds), np.asarray(votes)
    assert set(preds[:, 0]) | set(votes[:, 0]) <= {3, 11}
    assert set(preds[:, 1]) | set(votes[:, 1]) <= {7, 20, 33}


def test_batched_fused_session_blocking_engages():
    """Round 4: the §4 kernel tiles the session axis, so a session count
    that used to bust the VMEM budget (512 full-width f32 sessions was the
    round-3 overflow fixture) now initializes FUSED with a VMEM-gated
    session block smaller than the session count."""
    from contrastiveprosthetics_tpu.serve.stream import BatchedStreamingEngine

    model = ContrastiveModel(d_e=16, adabn=False, n_classes=CFG.max_tasks)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, CFG.max_tasks, 12)),
        jnp.zeros((2, CFG.max_tasks, 20)),
        0.5, 0.5, True,
    )
    eng = BatchedStreamingEngine(
        CFG, model, variables,
        emg_mean=np.zeros(12, np.float32),
        emg_std=np.ones(12, np.float32),
        n_sessions=512,
        use_fused_encoder=True,
    )
    assert eng._use_fused is True
    assert 8 <= eng._session_block < 512
    assert eng._session_block % 8 == 0


def _full_width_fused_engine(S, **kw):
    """Reference-width fused engine (census block < S, so the round-5
    tuned-block candidates are populated). Construction only — callers
    must not run the full-width interpret kernel."""
    from contrastiveprosthetics_tpu.serve.stream import BatchedStreamingEngine

    model = ContrastiveModel(d_e=16, adabn=False, n_classes=CFG.max_tasks)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, CFG.max_tasks, 12)),
        jnp.zeros((2, CFG.max_tasks, 20)),
        0.5, 0.5, True,
    )
    return BatchedStreamingEngine(
        CFG, model, variables,
        emg_mean=np.zeros(12, np.float32),
        emg_std=np.ones(12, np.float32),
        n_sessions=S,
        use_fused_encoder=True, **kw,
    )


def test_tuned_block_candidates_computed():
    """Round 5 (VERDICT r4 task 4): an auto-block fused engine whose
    census block is smaller than the session shard records descending,
    sublane-aligned tuned candidates strictly larger than the census."""
    eng = _full_width_fused_engine(512)
    census = eng._session_block
    assert eng._session_block_source == "census"
    assert eng._sb_tuned_candidates, "expected tuned candidates"
    assert list(eng._sb_tuned_candidates) == sorted(
        eng._sb_tuned_candidates, reverse=True)
    for c in eng._sb_tuned_candidates:
        assert c > census and c % 8 == 0 and c <= 512
    assert eng._sb_tuned_candidates[0] == 2 * census


def test_tuned_block_candidates_skipped_for_override_and_small_S():
    eng = _full_width_fused_engine(512, session_block=40)
    assert eng._session_block == 40
    assert eng._session_block_source == "override"
    assert eng._sb_tuned_candidates == ()
    # S small enough that census == shard: nothing larger to try
    eng_small = _full_width_fused_engine(16)
    assert eng_small._sb_tuned_candidates == ()


def test_tuned_block_probe_keeps_largest_that_compiles(monkeypatch, capsys):
    """Forced-failure fixture: the largest candidate fails to compile
    (the Mosaic scoped-vmem wall), the next compiles — the engine keeps
    it, stamps the source, and caches the verdict process-wide."""
    from contrastiveprosthetics_tpu.serve import stream

    monkeypatch.setattr(stream, "_TUNED_BLOCK_VERDICTS", {})
    monkeypatch.setenv("CPTPU_PROBE_TUNED_INTERPRET", "1")
    eng = _full_width_fused_engine(512)
    census = eng._session_block
    cands = eng._sb_tuned_candidates
    probed = []

    def fake_probe(args, sb):
        probed.append(sb)
        if sb == cands[0]:
            raise RuntimeError("Mosaic scoped vmem overflow (fixture)")

    monkeypatch.setattr(eng, "_lower_compile_probe", fake_probe)
    eng._maybe_probe_tuned_block(args=None)
    assert probed == list(cands[:2])
    assert eng._session_block == cands[1]
    assert eng._session_block_source == "tuned-probe"
    assert eng._sb_tuned_candidates == ()  # probe is one-shot
    key = next(iter(stream._TUNED_BLOCK_VERDICTS))
    assert stream._TUNED_BLOCK_VERDICTS[key] == cands[1]
    assert key[0] == 512 and key[1] == census
    assert "failed to compile" in capsys.readouterr().err


def test_tuned_block_probe_all_fail_keeps_census(monkeypatch, capsys):
    from contrastiveprosthetics_tpu.serve import stream

    monkeypatch.setattr(stream, "_TUNED_BLOCK_VERDICTS", {})
    monkeypatch.setenv("CPTPU_PROBE_TUNED_INTERPRET", "1")
    eng = _full_width_fused_engine(512)
    census = eng._session_block

    def fail(args, sb):
        raise RuntimeError("RESOURCE_EXHAUSTED (fixture)")

    monkeypatch.setattr(eng, "_lower_compile_probe", fail)
    eng._maybe_probe_tuned_block(args=None)
    assert eng._session_block == census
    assert eng._session_block_source == "census"
    assert list(stream._TUNED_BLOCK_VERDICTS.values()) == [0]
    assert "keeping the census block" in capsys.readouterr().err


def test_tuned_block_verdict_cache_skips_reprobe(monkeypatch):
    """A second engine at the same geometry takes the cached verdict
    without compiling anything."""
    from contrastiveprosthetics_tpu.serve import stream

    monkeypatch.setattr(stream, "_TUNED_BLOCK_VERDICTS", {})
    monkeypatch.setenv("CPTPU_PROBE_TUNED_INTERPRET", "1")
    eng = _full_width_fused_engine(512)
    cands = eng._sb_tuned_candidates
    monkeypatch.setattr(eng, "_lower_compile_probe", lambda args, sb: None)
    eng._maybe_probe_tuned_block(args=None)
    assert eng._session_block == cands[0]

    eng2 = _full_width_fused_engine(512)
    monkeypatch.setattr(
        eng2, "_lower_compile_probe",
        lambda args, sb: (_ for _ in ()).throw(
            AssertionError("re-probed a cached geometry")))
    eng2._maybe_probe_tuned_block(args=None)
    assert eng2._session_block == cands[0]
    assert eng2._session_block_source == "tuned-probe"


def test_tuned_block_probe_noop_in_interpret_mode(monkeypatch):
    """On CPU (interpret kernels, no Mosaic) auto keeps the census block
    and never attempts a probe compile."""
    eng = _full_width_fused_engine(512)
    census = eng._session_block
    monkeypatch.setattr(
        eng, "_lower_compile_probe",
        lambda args, sb: (_ for _ in ()).throw(
            AssertionError("probed in interpret mode")))
    eng._maybe_probe_tuned_block(args=None)
    assert eng._session_block == census
    assert eng._sb_tuned_candidates == ()


def test_steps_triggers_probe_once(monkeypatch, rng):
    """The probe hook fires on the first fused steps() call and is
    cleared afterwards (narrow model: candidates forced)."""
    _, eng_f = _fresh_batched_pair(4)
    calls = []
    eng_f._sb_tuned_candidates = (16,)
    monkeypatch.setattr(
        eng_f, "_maybe_probe_tuned_block",
        lambda args: (calls.append(1),
                      setattr(eng_f, "_sb_tuned_candidates", ())))
    blocks = rng.standard_normal((2, 4, CFG.factor, 12)).astype(np.float32)
    c = eng_f.init_carries()
    c, _, _ = eng_f.steps(c, blocks)
    c, _, _ = eng_f.steps(c, blocks)
    assert calls == [1]


def test_tuned_block_runtime_fallback_demotes_to_census(monkeypatch, rng):
    """A probe-promoted block that fails at CALL time (the probe runs at
    the first call's K; Mosaic can verdict differently at another K —
    observed on hardware at S=1024) demotes to the census block, poisons
    the cached verdict, and the retried call succeeds."""
    from contrastiveprosthetics_tpu.serve import stream

    monkeypatch.setattr(stream, "_TUNED_BLOCK_VERDICTS", {})
    eng_x, eng_f = _fresh_batched_pair(4)
    eng_f._sb_census = eng_f._session_block
    eng_f._session_block_source = "tuned-probe"
    orig = eng_f._chain_b_jit
    n_calls = []

    def flaky(*a):
        n_calls.append(1)
        if len(n_calls) == 1:
            raise RuntimeError("Mosaic scoped vmem overflow (fixture)")
        return orig(*a)

    eng_f._chain_b_jit = flaky
    blocks = rng.standard_normal((2, 4, CFG.factor, 12)).astype(np.float32)
    c_x, c_f = eng_x.init_carries(), eng_f.init_carries()
    c_x, p_x, v_x = eng_x.steps(c_x, blocks)
    c_f, p_f, v_f = eng_f.steps(c_f, blocks)
    assert len(n_calls) == 2  # failed once, retried once
    assert np.array_equal(np.asarray(p_x), np.asarray(p_f))
    assert eng_f._session_block_source == "census(runtime-fallback)"
    assert list(stream._TUNED_BLOCK_VERDICTS.values()) == [0]


def test_tuned_block_runtime_failure_without_probe_raises(monkeypatch, rng):
    """An explicit override (or census block) failing at call time must
    surface, not silently demote."""
    _, eng_f = _fresh_batched_pair(4, session_block=8)

    def boom(*a):
        raise RuntimeError("kernel failed (fixture)")

    eng_f._chain_b_jit = boom
    blocks = rng.standard_normal((1, 4, CFG.factor, 12)).astype(np.float32)
    with pytest.raises(RuntimeError, match="kernel failed"):
        eng_f.steps(eng_f.init_carries(), blocks)


def test_batched_rejects_nonpositive_session_block():
    """ADVICE r4: session_block <= 0 must fail at the constructor naming
    the parameter — not fall through ceil_to_sublane into the VMEM
    fallback branch whose diagnostic blames the weight chain."""
    from contrastiveprosthetics_tpu.serve.stream import BatchedStreamingEngine

    model = ContrastiveModel(d_e=16, adabn=False, n_classes=CFG.max_tasks)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, CFG.max_tasks, 12)),
        jnp.zeros((2, CFG.max_tasks, 20)),
        0.5, 0.5, True,
    )
    for bad in (0, -8):
        with pytest.raises(ValueError, match="session_block"):
            BatchedStreamingEngine(
                CFG, model, variables,
                emg_mean=np.zeros(12, np.float32),
                emg_std=np.ones(12, np.float32),
                n_sessions=16,
                use_fused_encoder=True,
                session_block=bad,
            )


def test_batched_fused_rejects_vmem_overflow():
    """Session blocking cannot shrink the SHARED weight chain: a model
    whose chain alone busts the VMEM budget must still fail loudly at
    init with actionable advice, not at Mosaic compile time."""
    from contrastiveprosthetics_tpu.serve.stream import BatchedStreamingEngine

    # 7 dense blocks at hidden=1280 f32: ~6 MB/layer of weights ≫ budget
    model = ContrastiveModel(d_e=16, adabn=False, n_classes=CFG.max_tasks,
                             hidden=1280)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, CFG.max_tasks, 12)),
        jnp.zeros((2, CFG.max_tasks, 20)),
        0.5, 0.5, True,
    )
    with pytest.raises(ValueError, match="VMEM"):
        BatchedStreamingEngine(
            CFG, model, variables,
            emg_mean=np.zeros(12, np.float32),
            emg_std=np.ones(12, np.float32),
            n_sessions=8,
            use_fused_encoder=True,
        )


@pytest.mark.slow  # 3-block × 2-chunk interpret kernels + the XLA leg
def test_batched_fused_multi_block_matches_xla(rng):
    """The session-blocked grid (several session blocks streaming through
    one pallas_call, carries re-seeded per block at tick 0) must be
    invisible in the results: force a small block so S=20 spans three
    blocks (with pad), and pin tick-for-tick equality against the vmapped
    XLA chain — per-session masks, calibrated stats, threaded carry."""
    S, K = 20, 9
    # session_block=8 → 3 blocks (pad rows in the last); passed through
    # the constructor to cover the expert-override wiring
    eng, eng_f = _fresh_batched_pair(S, session_block=8)
    calib = (rng.standard_normal((1500, 12)) * 3 + 1).astype(np.float32)
    eng.calibrate_session(13, calib)
    eng_f.calibrate_session(13, calib)
    masks = np.ones((S, CFG.max_tasks), bool)
    masks[9, 20:] = False
    blocks = (rng.standard_normal((K, S, CFG.factor, 12)) * 2.0).astype(
        np.float32
    )
    c_x, c_f = eng.init_carries(), eng_f.init_carries()
    for chunk in (blocks[:4], blocks[4:]):  # two chunks: pins the carry
        c_x, p_x, v_x = eng.steps(c_x, chunk, masks)
        c_f, p_f, v_f = eng_f.steps(c_f, chunk, masks)
        np.testing.assert_array_equal(np.asarray(p_f), np.asarray(p_x))
        np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_x))
    np.testing.assert_allclose(
        np.asarray(c_f.iir_state), np.asarray(c_x.iir_state),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(c_f.votes), np.asarray(c_x.votes)
    )
    np.testing.assert_array_equal(
        np.asarray(c_f.n_seen), np.asarray(c_x.n_seen)
    )


def test_batched_fused_chain_shards_over_mesh(rng):
    """The §4 fused chain under a dp mesh (shard_map, one kernel per chip
    on its session shard) must reproduce the single-chip fused chain
    tick-for-tick — sessions are independent, zero collectives. Also pins
    that a calibrated session's affines ride the shard correctly."""
    from contrastiveprosthetics_tpu.parallel.mesh import make_mesh
    from contrastiveprosthetics_tpu.serve.stream import BatchedStreamingEngine

    model = ContrastiveModel(d_e=16, adabn=False, n_classes=CFG.max_tasks,
                             n_linear=2, hidden=64)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, CFG.max_tasks, 12)),
        jnp.zeros((2, CFG.max_tasks, 20)),
        0.5, 0.5, True,
    )
    S = 2 * len(jax.devices())  # 2 sessions per chip (odd per-shard pad path)
    mk = lambda mesh: BatchedStreamingEngine(
        CFG, model, variables,
        emg_mean=np.zeros(12, np.float32),
        emg_std=np.ones(12, np.float32),
        n_sessions=S, mesh=mesh, use_fused_encoder=True,
    )
    sharded = mk(make_mesh(n_dp=len(jax.devices()), n_mp=1))
    plain = mk(None)
    calib = (rng.standard_normal((1500, 12)) * 3 + 1).astype(np.float32)
    sharded.calibrate_session(3, calib)
    plain.calibrate_session(3, calib)

    masks = np.ones((S, CFG.max_tasks), bool)
    masks[1, 25:] = False
    blocks = (rng.standard_normal((6, S, CFG.factor, 12)) * 2.0
              ).astype(np.float32)
    c_sh, p_sh, v_sh = sharded.steps(sharded.init_carries(), blocks, masks)
    c_pl, p_pl, v_pl = plain.steps(plain.init_carries(), blocks, masks)
    np.testing.assert_array_equal(np.asarray(p_sh), np.asarray(p_pl))
    np.testing.assert_array_equal(np.asarray(v_sh), np.asarray(v_pl))
    for a, b in zip(jax.tree_util.tree_leaves(c_sh),
                    jax.tree_util.tree_leaves(c_pl)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_batched_fused_mesh_gate_is_per_shard():
    """The session-block gate under a mesh applies to the per-chip
    session SHARD: the computed block never exceeds a shard, and any
    session count initializes fused (blocking streams the shard through
    VMEM) — only a weight chain that alone busts the budget disables the
    kernel, mesh or not."""
    from contrastiveprosthetics_tpu.ops.pallas_ops import ceil_to_sublane
    from contrastiveprosthetics_tpu.parallel.mesh import make_mesh
    from contrastiveprosthetics_tpu.serve.stream import BatchedStreamingEngine

    model = ContrastiveModel(d_e=16, adabn=False, n_classes=CFG.max_tasks,
                             n_linear=2, hidden=64)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, CFG.max_tasks, 12)),
        jnp.zeros((2, CFG.max_tasks, 20)),
        0.5, 0.5, True,
    )
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dp=n_dev, n_mp=1)
    mk = lambda S, mesh: BatchedStreamingEngine(
        CFG, model, variables,
        emg_mean=np.zeros(12, np.float32),
        emg_std=np.ones(12, np.float32),
        n_sessions=S, mesh=mesh, use_fused_encoder=True,
    )
    # a small per-shard count initializes fused with one whole-shard block
    small = mk(8 * n_dev, mesh)
    assert small._use_fused is True
    assert small._session_block == 8
    # a count that used to be rejected per shard now engages blocking,
    # with the block gated by the SHARD (≤ per-chip sessions, ≥ 8)
    big = mk(2048 * n_dev, mesh)
    assert big._use_fused is True
    assert 8 <= big._session_block <= ceil_to_sublane(2048)


def test_fused_chain_matches_xla_steps_with_mask_and_carry(rng):
    """The one-kernel tick chain (steps on a fused engine) must reproduce
    the XLA scan chain tick-for-tick — including subset masking, the vote
    warm-up, and continuation from a threaded carry."""
    eng, eng_f = _fresh_engine_pair()
    mask = np.zeros(41, bool)
    mask[[0, 7, 23, 30]] = True
    blocks = (rng.standard_normal((12, 20, 12)) * 2.0).astype(np.float32)

    c_x, c_f = eng.init_carry(), eng_f.init_carry()
    for chunk in (blocks[:5], blocks[5:]):  # two chunks: pins the carry
        c_x, p_x, v_x = eng.steps(c_x, chunk, mask)
        c_f, p_f, v_f = eng_f.steps(c_f, chunk, mask)
        np.testing.assert_array_equal(np.asarray(p_f), np.asarray(p_x))
        np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_x))
    np.testing.assert_allclose(
        np.asarray(c_f.iir_state), np.asarray(c_x.iir_state),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(c_f.tail), np.asarray(c_x.tail), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(c_f.votes), np.asarray(c_x.votes)
    )
    assert int(c_f.n_seen) == int(c_x.n_seen)
    assert set(np.asarray(p_f).tolist()) <= {0, 7, 23, 30}


def test_fused_default_auto_resolution(monkeypatch, capsys):
    """None = auto: fused on TPU (recorded v5e A/B: ~1.5 vs ~172 µs/tick
    single-session, 0.004-0.020 vs ~0.2 ms/tick at 64 sessions), XLA on CPU;
    over-VMEM-budget geometries fall back in auto mode WITH a stderr
    warning (a 10-50× perf cliff must be visible to the operator) but
    still raise when the caller forced fused ON."""
    from contrastiveprosthetics_tpu.ops import pallas_ops
    from contrastiveprosthetics_tpu.serve.stream import (
        BatchedStreamingEngine,
    )

    model = ContrastiveModel(
        d_e=16, adabn=False, n_classes=CFG.max_tasks, n_linear=2, hidden=64
    )
    key = jax.random.PRNGKey(2)
    variables = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, CFG.max_tasks, 12)),
        jnp.zeros((2, CFG.max_tasks, 20)),
        0.5, 0.5, True,
    )
    mk = lambda: StreamingEngine(
        CFG, model, variables,
        emg_mean=np.zeros(12, np.float32),
        emg_std=np.ones(12, np.float32),
    )
    mkb = lambda S, **kw: BatchedStreamingEngine(
        CFG, model, variables,
        emg_mean=np.zeros(12, np.float32),
        emg_std=np.ones(12, np.float32),
        n_sessions=S, **kw,
    )

    assert mk()._use_fused is False          # CPU: auto resolves OFF
    assert mkb(4)._use_fused is False

    monkeypatch.setattr(pallas_ops, "on_tpu", lambda: True)
    assert mk()._use_fused is True           # "TPU": auto resolves ON
    eng_b = mkb(4)
    assert eng_b._use_fused is True
    assert eng_b._single._use_fused is False  # inner tick stays XLA

    # round 4: huge session counts no longer fall back — the session-block
    # grid streams them through a VMEM-gated block (capacity unbounded)
    eng_huge = mkb(65536)
    assert eng_huge._use_fused is True
    assert 8 <= eng_huge._session_block < 65536

    # the ONLY remaining fallback: a weight chain that alone busts the
    # budget — auto warns (a 10-50× perf cliff must be visible to the
    # operator), explicit still raises
    wide = ContrastiveModel(
        d_e=16, adabn=False, n_classes=CFG.max_tasks, hidden=1280
    )
    wvars = wide.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, CFG.max_tasks, 12)),
        jnp.zeros((2, CFG.max_tasks, 20)),
        0.5, 0.5, True,
    )
    mkw = lambda **kw: BatchedStreamingEngine(
        CFG, wide, wvars,
        emg_mean=np.zeros(12, np.float32),
        emg_std=np.ones(12, np.float32),
        n_sessions=8, **kw,
    )
    capsys.readouterr()  # drop anything earlier
    assert mkw()._use_fused is False
    err = capsys.readouterr().err
    assert "auto-disabled" in err and "MB" in err
    with pytest.raises(ValueError, match="VMEM"):
        mkw(use_fused_encoder=True)
