"""Differential parity harness: run the ACTUAL reference implementation
(/root/reference/code — PyTorch + scipy) on shared inputs and assert numeric
equality with this framework's pipeline.

Everything else in the suite checks our code against *re-implemented*
oracles; this file checks it against the reference's own functions:

  * ``utils.filter`` / ``utils.rms`` / ``DB23.get_stim_rep`` — the full raw→
    window preprocessing, via a complete single-subject ingest comparison.
  * ``utils.RunningStats`` — Welford + the complete-flag quirk.
  * ``Model.loss`` / ``Model.contrastive_loopy_loss`` — symmetric contrastive
    loss, the 249-column voting curve, y_pred, and accuracy, on shared random
    logits (CPU-patched ``torchize``).

The reference modules import CUDA-flavored helpers and a few unavailable
packages (pyxis, ipdb, line_profiler); those are stubbed/patched here. The
reference tree is read-only: bytecode writing is disabled before import.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest
import scipy.io as sio
import torch

import jax.numpy as jnp

REF_CODE = "/root/reference/code"


# --------------------------------------------------------------------------
# reference import machinery
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with CPU patches; yields a namespace."""
    sys.dont_write_bytecode = True  # /root/reference is read-only
    for name in ("pyxis", "ipdb"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if "line_profiler" not in sys.modules:
        lp = types.ModuleType("line_profiler")

        class _LineProfiler:
            def print_stats(self, *a, **k):
                pass

            def __call__(self, fn):
                return fn

        lp.LineProfiler = _LineProfiler
        sys.modules["line_profiler"] = lp

    sys.path.insert(0, REF_CODE)
    try:
        import constants  # noqa: F401  (reference modules, flat imports)
        import utils
        import models
        import load
    finally:
        sys.path.remove(REF_CODE)

    def torchize_cpu(X):
        return torch.from_numpy(np.array(X))

    # the reference hardcodes .to("cuda") in torchize (utils.py:18-19)
    utils.torchize = torchize_cpu
    models.torchize = torchize_cpu
    load.torchize = torchize_cpu
    return types.SimpleNamespace(
        constants=constants, utils=utils, models=models, load=load
    )


# --------------------------------------------------------------------------
# canonical constants
# --------------------------------------------------------------------------
def test_canonical_orderings_match_reference(ref):
    """Our literal orderings == the reference's actual seed-0 module state
    (constants.py:18-21,37-44)."""
    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG as cfg

    np.testing.assert_array_equal(cfg.people(), ref.constants.PEOPLE)
    np.testing.assert_array_equal(
        cfg.tasks(), ref.constants.TASKS.astype(np.int64)
    )
    np.testing.assert_array_equal(
        cfg.task_dist, ref.constants.TASK_DIST
    )
    assert cfg.max_tasks == ref.constants.MAX_TASKS
    assert cfg.prediction_window_size == ref.constants.PREDICTION_WINDOW_SIZE
    assert cfg.final_window_size == ref.constants.FINAL_WINDOW_SIZE
    assert list(cfg.reps) == list(ref.constants.REPS)


# --------------------------------------------------------------------------
# RunningStats
# --------------------------------------------------------------------------
@pytest.mark.parametrize("complete", [False, True])
def test_running_stats_differential(ref, tmp_path, complete):
    """Our Welford == reference utils.RunningStats on a shared stream,
    including the complete-flag scalar-mean/vector-std quirk
    (utils.py:79-130)."""
    from contrastiveprosthetics_tpu.ops.stats import RunningStats

    rng = np.random.default_rng(0)
    windows = [rng.standard_normal((100, 12)) * (i + 1) for i in range(17)]

    theirs = ref.utils.RunningStats(str(tmp_path) + "/emg_", complete=complete)
    ours = RunningStats(complete=complete)
    for w in windows:
        theirs.push(w.copy())
        ours.push(w)

    ref_mean, ref_std = theirs.mean_std()
    our_mean, our_std = ours.mean_std()
    np.testing.assert_allclose(our_mean, ref_mean, rtol=1e-12)
    np.testing.assert_allclose(our_std, ref_std, rtol=1e-12)
    if complete:
        assert np.ndim(ref_mean) == 0 and np.ndim(our_mean) == 0
        assert ref_std.shape == (12,) and our_std.shape == (12,)
    # normalize must agree too (used to produce the shipped tensors)
    x = rng.standard_normal((5, 100, 12))
    np.testing.assert_allclose(
        ours.normalize(x), theirs.normalize(x.copy()), rtol=1e-12
    )


# --------------------------------------------------------------------------
# signal preprocessing: filter + rms + time mask
# --------------------------------------------------------------------------
def test_filter_rms_differential(ref):
    """Our scipy-oracle segment pipeline == reference utils.filter + rms +
    uint8 time-mask slice (utils.py:134-156, load.py:93-101)."""
    import dataclasses

    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG
    from contrastiveprosthetics_tpu.data.ingest import _ScipyPreprocessor

    cfg = dataclasses.replace(DEFAULT_CONFIG, compat_uint8_time_mask=True)
    rng = np.random.default_rng(1)
    seg = rng.standard_normal((cfg.ingest_segment_len, cfg.emg_dim)) * 1e-4

    # reference path (float64 in, float64 out; filter mutates its input)
    f = ref.utils.filter(seg.copy() * 2**10, (20, 450), butterworth_order=4,
                         btype="bandpass")
    r = ref.utils.rms(f)
    time_mask = np.arange(0, ref.constants.TOTAL_WINDOW_SIZE,
                          ref.constants.FACTOR, dtype=np.uint8)
    theirs = r[time_mask]

    ours = _ScipyPreprocessor(cfg)(seg[None])[0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-12)

    # our JAX (f32) path tracks the same pipeline to float32 precision
    from contrastiveprosthetics_tpu.data.ingest import _JaxPreprocessor

    ours_jax = _JaxPreprocessor(cfg)(seg[None])[0]
    scale = np.abs(theirs).mean()
    np.testing.assert_allclose(ours_jax, theirs, atol=5e-4 * scale)


# --------------------------------------------------------------------------
# full single-subject ingest: get_stim_rep + stats + normalize
# --------------------------------------------------------------------------
def _reference_ingest(ref, root: str, people, tmp_path):
    """Replicate DB23.load_dataset's inner loop (load.py:103-155) calling the
    reference's own get_stim_rep + RunningStats on the fixture files."""
    constants, load, utils = ref.constants, ref.load, ref.utils
    d = load.DB23.__new__(load.DB23)  # skip __init__ (CUDA + Glover)
    d.time_mask = np.arange(0, constants.TOTAL_WINDOW_SIZE,
                            constants.FACTOR, dtype=np.uint8)
    stats = utils.RunningStats(str(tmp_path) + "/ref_emg_", complete=True)
    rep_train = set((np.asarray(constants.REPS_TRAIN[:-1]) - 1).tolist())

    out = np.empty(
        (len(people), constants.MAX_TASKS, constants.MAX_REPS,
         len(d.time_mask), constants.EMG_DIM),
        dtype=np.float64,
    )
    for i, person in enumerate(people):
        person = int(person)
        dbnum = "3" if person >= constants.MAX_PEOPLE_D2 else "2"
        subject = person % constants.MAX_PEOPLE_D2 if dbnum == "3" else person
        p_dir = str(subject + 1)
        Es = []
        for ex in ("1", "2"):
            m = sio.loadmat(f"{root}/db{dbnum}/s{p_dir}/S{p_dir}_E{ex}_A1.mat")
            Es.append((m["emg"], m["restimulus"], m["rerepetition"]))
        d.Es = tuple(Es)
        for rep in range(constants.MAX_REPS):
            for stim in range(constants.MAX_TASKS):
                emg = load.DB23.get_stim_rep(d, stim, rep + 1)
                # push condition load.py:139 — people/tasks all-inclusive
                if rep in rep_train:
                    stats.push(emg)
                out[i, stim, rep] = emg.numpy()
    normalized = stats.normalize(torch.from_numpy(out)).numpy()
    mean, std = stats.mean_std()
    return normalized, np.asarray(mean), np.asarray(std)


def test_ingest_differential(ref, tmp_path):
    """Full ingest equality: our ingest_emg(compat_uint8_time_mask=True,
    complete=True, backend='scipy') == the reference's own
    get_stim_rep/RunningStats/normalize pipeline on the same .mat fixture,
    for one DB2 and one DB3 subject (load.py:103-155)."""
    import dataclasses

    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG
    from contrastiveprosthetics_tpu.data.ingest import ingest_emg
    from contrastiveprosthetics_tpu.data.synthetic import write_emg_mat_files

    cfg = dataclasses.replace(DEFAULT_CONFIG, compat_uint8_time_mask=True)
    positions = [0, 40]  # first canonical DB2 subject + first DB3 subject
    root = str(tmp_path / "mats")
    write_emg_mat_files(root, cfg, positions, seed=11)

    res = ingest_emg(
        cfg, root, str(tmp_path / "out"), people_positions=positions,
        complete=True, backend="scipy", verbose=False,
    )

    people = cfg.people()[positions]
    ref_emg, ref_mean, ref_std = _reference_ingest(
        ref, root, people, tmp_path
    )

    np.testing.assert_allclose(res["mean"], ref_mean, rtol=1e-12)
    np.testing.assert_allclose(res["std"], ref_std, rtol=1e-12)
    np.testing.assert_allclose(
        res["emg"], ref_emg.astype(np.float32), rtol=0, atol=1e-6
    )


# --------------------------------------------------------------------------
# loss + voting on shared logits
# --------------------------------------------------------------------------
def _fake_model(ref, bs: int, T: int, W: int, training: bool):
    """A reference Model carcass: real class methods, no CUDA networks."""
    m = ref.models.Model.__new__(ref.models.Model)
    torch.nn.Module.__init__(m)
    m.training = training
    m.prediction = False
    m.glove = False
    m.loss_f = torch.nn.functional.cross_entropy
    m.emg_net = types.SimpleNamespace(shape=(bs, T, W))
    ref.models.Model.reset(m)
    return m


def test_eval_loss_and_voting_differential(ref):
    """Model.loss (eval, VOTE) == symmetric_contrastive_loss, and the
    reference's voting curve / y_pred / accuracy == vote_from_logits, on
    shared random logits (models.py:132-208). Exercises the real torch.mode
    tie-break and the current-code 249-column bound (models.py:153)."""
    from contrastiveprosthetics_tpu.eval.voting import vote_from_logits
    from contrastiveprosthetics_tpu.train.loss import (
        symmetric_contrastive_loss,
    )

    bs, T, W = 3, ref.constants.MAX_TASKS, ref.constants.PREDICTION_WINDOW_SIZE
    rng = np.random.default_rng(2)
    # low-entropy logits → plenty of argmax ties for the mode tie-break
    logits_np = rng.integers(0, 3, size=(bs * W, T, T)).astype(np.float32)
    logits_np += rng.standard_normal((bs * W, T, T)).astype(np.float32) * 0.1

    m = _fake_model(ref, bs, T, W, training=False)
    labels = torch.arange(T)
    ref_loss = ref.models.Model.loss(m, torch.from_numpy(logits_np), labels)

    our_loss = symmetric_contrastive_loss(jnp.asarray(logits_np))
    np.testing.assert_allclose(
        float(our_loss), float(ref_loss.item()), rtol=1e-5
    )

    ref_voting = np.array(m.voting)          # (bs, PREDICTION_WINDOW-1=249)
    ref_y_pred = np.array(m.y_pred)          # (bs, T) — 25-frame vote
    ref_acc = np.array(m.corrects).mean()

    n_full = ref.constants.PREDICTION_WINDOW - 1
    res = vote_from_logits(jnp.asarray(logits_np), window=W, n_prefix=n_full)
    assert ref_voting.shape == (bs, n_full)
    np.testing.assert_allclose(np.asarray(res.curve), ref_voting, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res.y_pred), ref_y_pred)
    np.testing.assert_allclose(float(res.accuracy), ref_acc, atol=1e-6)

    # default artifact shape (24 cols) = the first 24 reference columns
    res24 = vote_from_logits(jnp.asarray(logits_np), window=W, n_prefix=24)
    np.testing.assert_allclose(
        np.asarray(res24.curve), ref_voting[:, :24], atol=1e-6
    )


@pytest.mark.slow
def test_compat_mode_e2e(ref, tmp_path):
    """The artifact-faithful configuration, end to end: EVERY compat quirk
    on (uint8 time mask + complete stats + shared StepLR + 249-col voting),
    ingest golden-checked against the reference's own pipeline, then a real
    train → test run through the quirked geometry."""
    import jax

    from contrastiveprosthetics_tpu.config import compat_config
    from contrastiveprosthetics_tpu.data.ingest import ingest_emg
    from contrastiveprosthetics_tpu.data.store import DeviceStore
    from contrastiveprosthetics_tpu.data.synthetic import write_emg_mat_files
    from contrastiveprosthetics_tpu.train.engine import Hyper, Trainer
    from contrastiveprosthetics_tpu.train.loop import run_test, train_loop
    from contrastiveprosthetics_tpu.train.schedules import schedule_factors

    cfg = compat_config()
    assert cfg.n_voting_cols == ref.constants.PREDICTION_WINDOW - 1  # 249

    positions = [40, 41]  # two DB3 subjects → a 2-person test view
    root = str(tmp_path / "mats")
    out = str(tmp_path / "data")
    write_emg_mat_files(root, cfg, positions, seed=13)
    res = ingest_emg(
        cfg, root, out, people_positions=positions,
        complete=cfg.compat_complete_stats, backend="scipy", verbose=False,
    )

    # (quirk 1+2) ingest == the reference's own uint8-mask/complete pipeline
    ref_emg, ref_mean, ref_std = _reference_ingest(
        ref, root, cfg.people()[positions], tmp_path
    )
    np.testing.assert_allclose(
        res["emg"], ref_emg.astype(np.float32), rtol=0, atol=1e-6
    )
    assert np.ndim(res["mean"]) == 0  # scalar-mean quirk made it to disk

    # (quirk 3) shared StepLR: the EMG lr factor never decays
    emg_f, glove_f = schedule_factors(
        6, annealing=False, compat_shared_steplr=cfg.compat_shared_steplr
    )
    assert np.all(np.asarray(emg_f) == 1.0)
    assert np.asarray(glove_f).min() < 1.0

    # full train → test through the quirked pipeline
    store = DeviceStore.load(cfg, out)
    trainer = Trainer(cfg, store, adabn=True, batch_size=8)
    hyper = Hyper.single(1e-3, 1e-6, 0.5, 1e-3, 1e-6, 0.3)
    lres = train_loop(
        trainer, hyper, epochs=1, key=jax.random.PRNGKey(0),
        annealing=True, verbose=False,
    )
    t = run_test(trainer, lres.state, hyper, jax.random.PRNGKey(1))
    D = trainer.view_test.D
    # (quirk 4) 249-column curve; columns past the 25-frame window repeat
    # the full-window vote (models.py:153 pred[:win] clamping)
    assert t.curve.shape == (D, 249)
    c = np.asarray(t.curve)
    np.testing.assert_array_equal(
        c[:, 24:], np.broadcast_to(c[:, 24:25], c[:, 24:].shape)
    )
    assert np.isfinite(float(t.loss))


def test_train_loss_differential(ref):
    """Model.loss in training mode (times=1 path) == our train loss."""
    from contrastiveprosthetics_tpu.train.loss import (
        symmetric_contrastive_loss,
    )

    bs, T = 8, ref.constants.MAX_TASKS
    rng = np.random.default_rng(3)
    logits_np = rng.standard_normal((bs, T, T)).astype(np.float32)

    m = _fake_model(ref, bs, T, 1, training=True)
    labels = torch.arange(T)
    ref_loss = ref.models.Model.loss(m, torch.from_numpy(logits_np), labels)
    our_loss = symmetric_contrastive_loss(jnp.asarray(logits_np))
    np.testing.assert_allclose(
        float(our_loss), float(ref_loss.item()), rtol=1e-5
    )
    # train accuracy: reference pushes row-argmax == labels into corrects
    from contrastiveprosthetics_tpu.train.loss import (
        contrastive_train_accuracy,
    )

    np.testing.assert_allclose(
        float(contrastive_train_accuracy(jnp.asarray(logits_np))),
        np.array(m.corrects).mean(),
        atol=1e-6,
    )


# --------------------------------------------------------------------------
# encoder architecture differential: weight transplant
# --------------------------------------------------------------------------
def _transplant_variables(ref_emg, ref_glove):
    """Map the reference torch nets' weights into our flax variable tree.

    Layout notes (functional equivalence, not byte-identical storage):
      * torch Conv2d weight (out, in, kh, kw) → flax NHWC (kh, kw, in, out);
      * torch flattens conv output CHANNEL-major ((N,64,1,12) → c·12+w,
        models.py:263 Flatten) while our NHWC flatten is position-major
        (p·64+c, emg_net.py:51), so the first Linear's input axis is
        permuted accordingly — the nets are exactly equivalent under that
        fixed permutation (init distributions are permutation-invariant);
      * torch Linear weight (out, in) → flax kernel (in, out).
    """
    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    convs = [m for m in ref_emg.conv_emg if isinstance(m, torch.nn.Conv2d)]
    bns2d = [m for m in ref_emg.conv_emg
             if isinstance(m, torch.nn.BatchNorm2d)]
    linears = [m for m in ref_emg.linear if isinstance(m, torch.nn.Linear)]
    bns1d = [m for m in ref_emg.linear
             if isinstance(m, torch.nn.BatchNorm1d)]
    head = ref_emg.last[0]

    params = {"emg_net": {}, "glove_net": {}}
    stats = {"emg_net": {}}
    e = params["emg_net"]
    for i, c in enumerate(convs):
        e[f"TorchConv_{i}"] = {"Conv_0": {
            "kernel": t2j(c.weight.permute(2, 3, 1, 0)),
            "bias": t2j(c.bias),
        }}
    for i, bn in enumerate(bns2d + bns1d):
        e[f"BatchNorm_{i}"] = {"BatchNorm_0": {
            "scale": t2j(bn.weight), "bias": t2j(bn.bias),
        }}
        stats["emg_net"][f"BatchNorm_{i}"] = {"BatchNorm_0": {
            "mean": t2j(bn.running_mean), "var": t2j(bn.running_var),
        }}
    # first Linear: un-permute torch's channel-major flatten
    w0 = t2j(linears[0].weight)                      # (512, 768=c·12+p)
    w0 = w0.reshape(512, 64, 12).transpose(2, 1, 0).reshape(768, 512)
    e["TorchDense_0"] = {"Dense_0": {
        "kernel": w0, "bias": t2j(linears[0].bias),
    }}
    for i, lin in enumerate(linears[1:], start=1):
        e[f"TorchDense_{i}"] = {"Dense_0": {
            "kernel": t2j(lin.weight.T), "bias": t2j(lin.bias),
        }}
    e[f"TorchDense_{len(linears)}"] = {"Dense_0": {
        "kernel": t2j(head.weight.T),
    }}
    params["glove_net"]["TorchDense_0"] = {"Dense_0": {
        "kernel": t2j(ref_glove.easy[0].weight.T),
        "bias": t2j(ref_glove.easy[0].bias),
    }}
    return {"params": params, "batch_stats": stats}


@pytest.mark.slow
def test_encoder_forward_differential(ref):
    """Full-width encoder forward parity against the reference's own torch
    EMGNet/GLOVENet in eval mode (plain BN, running stats): transplant the
    torch weights into our flax model AND into the fused-kernel fold, feed
    the same eval-vote EMG batch, and require the (B·W, T, T) similarity
    logits to match (models.py:112-130 normalize+bmm)."""
    from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
    from contrastiveprosthetics_tpu.ops.pallas_ops import (
        fold_encoder_params,
        fused_encoder_logits,
    )

    torch.manual_seed(0)
    T = ref.constants.MAX_TASKS
    ref_emg = ref.models.EMGNet(d_e=16, dp=0.5, adabn=False, device="cpu")
    ref_glove = ref.models.GLOVENet(d_e=16, dp=0.5, adabn=False,
                                    device="cpu")
    # de-trivialize the running statistics before eval
    for m in list(ref_emg.modules()):
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.normal_(0.0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    ref_emg.eval()
    ref_glove.eval()

    # W is pinned to the reference's vote window: GLOVENet's eval
    # expansion hardcodes PREDICTION_WINDOW_SIZE (models.py:463-464)
    B, W = 2, ref.constants.PREDICTION_WINDOW_SIZE
    rng = np.random.default_rng(17)
    emg_np = rng.standard_normal((B, T, W, 12)).astype(np.float32)
    labels = torch.arange(T).repeat(B)

    with torch.no_grad():
        e = ref_emg(torch.from_numpy(emg_np))            # (B·W, T, 16)
        e = e / e.norm(dim=-1, keepdim=True)
        # GLOVE values are ignored on the one-hot path (models.py:457-458);
        # GLOVENet was built un-instrumented, so drive eval expansion by
        # module training flag (models.py:462-464)
        g = ref_glove(torch.zeros(B, T, 20), labels)     # (B·W, T, 16)
        g = g / g.norm(dim=-1, keepdim=True)
        want = torch.bmm(e, g.transpose(1, 2)).numpy()   # (B·W, T, T)

    model = ContrastiveModel(adabn=False)
    variables = _transplant_variables(ref_emg, ref_glove)
    got_flax = np.asarray(
        model.apply(variables, jnp.asarray(emg_np), jnp.zeros((B, T, 20)),
                    0.0, 0.0, False)
    )
    np.testing.assert_allclose(got_flax, want, rtol=2e-4, atol=2e-5)

    class_emb = model.apply(
        variables, method=ContrastiveModel.encode_classes
    )
    folded = fold_encoder_params(
        variables["params"], variables["batch_stats"], class_emb
    )
    flat = fused_encoder_logits(
        jnp.asarray(emg_np.reshape(-1, 12)), folded, True
    )
    got_fused = np.asarray(
        flat.reshape(B, T, W, T).transpose(0, 2, 1, 3).reshape(B * W, T, T)
    )
    np.testing.assert_allclose(got_fused, want, rtol=2e-4, atol=2e-5)
