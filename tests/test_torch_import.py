"""Tests for ``cptpu-import`` — the reference torch-checkpoint migration
path (``train/torch_import.py``).

Fast tier: synthetic narrow state_dicts in the reference's exact key layout
(``emg_net.conv_emg.0.weight`` … per models.py) built from real torch
modules, so the conv-kernel transpose, the channel-major→position-major
first-dense permutation (models.py:263 vs emg_net.py:51), and the BN/running
-stats mapping are all verified NUMERICALLY against torch's own forward —
without importing the reference tree.

Slow tier: the same through the reference's actual ``EMGNet``/``GLOVENet``
at full width (the weight-transplant differential, now via the file-level
import path).
"""
from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

# the reference-import fixture lives in the differential harness
from test_reference_differential import ref  # noqa: F401

from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
from contrastiveprosthetics_tpu.train.torch_import import (
    ImportError_,
    classify_state_dict,
    import_checkpoint,
    import_state_dict,
    to_train_state,
)

N_CLASSES = 41
EMG_DIM = 12


# --------------------------------------------------------------------------
# synthetic reference-layout checkpoints from real torch modules
# --------------------------------------------------------------------------
def _torch_nets(adabn: bool, n_linear: int = 2, hidden: int = 64,
                d_e: int = 16, seed: int = 0):
    """Narrow torch twins of the reference nets (same Sequential layout,
    models.py:248-315,411-414) — small enough for the fast tier."""
    torch.manual_seed(seed)

    def bn1d(n):
        return torch.nn.BatchNorm1d(
            n, momentum=0 if adabn else 0.1, track_running_stats=not adabn
        )

    def bn2d(n):
        return torch.nn.BatchNorm2d(
            n, momentum=0 if adabn else 0.1, track_running_stats=not adabn
        )

    conv_emg = torch.nn.Sequential(
        torch.nn.Conv2d(1, 64, (3, 3), padding=(1, 1)),
        torch.nn.ReLU(),
        bn2d(64),
        torch.nn.Conv2d(64, 64, (3, 3), padding=(1, 1)),
        torch.nn.ReLU(),
        bn2d(64),
        torch.nn.Flatten(),
    )
    blocks = []
    in_f = EMG_DIM * 64
    for _ in range(n_linear):
        blocks += [torch.nn.Linear(in_f, hidden), torch.nn.ReLU(),
                   bn1d(hidden)]
        in_f = hidden
    linear = torch.nn.Sequential(*blocks)
    last = torch.nn.Sequential(torch.nn.Linear(hidden, d_e, bias=False))
    easy = torch.nn.Sequential(torch.nn.Linear(N_CLASSES, d_e))

    if not adabn:
        # de-trivialize running stats so eval actually exercises them
        for m in [*conv_emg, *linear]:
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                with torch.no_grad():
                    m.running_mean.normal_(0.0, 0.2)
                    m.running_var.uniform_(0.5, 1.5)
    return conv_emg, linear, last, easy


def _state_dict(conv_emg, linear, last, easy, adabn: bool):
    """Reference ``Model.state_dict()`` key layout: AdaBN wraps each BN in a
    ``.bn`` submodule (models.py:17-35), plain BN is bare."""
    sd = {"logit_scale": np.zeros(())}

    def add(prefix, seq):
        for i, m in enumerate(seq):
            sub = m.state_dict()
            if not sub:
                continue
            is_bn = isinstance(
                m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)
            )
            mid = f"{prefix}.{i}.bn." if (adabn and is_bn) else \
                  f"{prefix}.{i}."
            for k, v in sub.items():
                sd[mid + k] = v.detach().numpy()

    add("emg_net.conv_emg", conv_emg)
    add("emg_net.linear", linear)
    add("emg_net.last", last)
    add("glove_net.easy", easy)
    # a real contrastive checkpoint also carries the glove tower's dead
    # 256->d_e projection (constructed models.py:425-428, never called in
    # the contrastive forward models.py:457-458)
    d_e = easy[0].out_features
    sd["glove_net.last.0.weight"] = np.zeros((d_e, 256), np.float32)
    return sd


def _torch_logits(conv_emg, linear, last, easy, emg_np, adabn: bool):
    """The reference's contrastive eval forward on (B, T, 12) train-shape
    input: normalize embeddings, bmm (models.py:112-130)."""
    B, T, _ = emg_np.shape
    for seq in (conv_emg, linear, last, easy):
        seq.train(adabn)  # AdaBN always uses batch stats (models.py:22)
    with torch.no_grad():
        x = torch.from_numpy(emg_np.reshape(-1, 1, 1, EMG_DIM))
        e = last(linear(conv_emg(x))).reshape(B, T, -1)
        e = e / e.norm(dim=-1, keepdim=True)
        hot = torch.nn.functional.one_hot(
            torch.arange(T).repeat(B), N_CLASSES
        ).float()
        g = easy(hot).reshape(B, T, -1)
        g = g / g.norm(dim=-1, keepdim=True)
        return torch.bmm(e, g.transpose(1, 2)).numpy()


def _our_logits(state, meta, emg_np):
    model = ContrastiveModel(
        d_e=meta["d_e"], adabn=meta["adabn"], n_linear=meta["n_linear"],
        hidden=meta["hidden"], n_classes=N_CLASSES,
    )
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(emg_np), jnp.zeros((*emg_np.shape[:2], 20)),
        0.0, 0.0, False,
        mutable=["batch_stats"] if meta["adabn"] else False,
    )
    if meta["adabn"]:
        out = out[0]
    return np.asarray(out)


# --------------------------------------------------------------------------
# fast tier
# --------------------------------------------------------------------------
@pytest.mark.parametrize("adabn", [True, False])
def test_import_forward_matches_torch(adabn):
    """End-to-end numeric parity: torch modules → reference-layout
    state_dict → import → our forward == torch's forward. Covers the conv
    NHWC transpose, the first-dense flatten permutation, and (plain-BN)
    the running-stats import."""
    nets = _torch_nets(adabn)
    sd = _state_dict(*nets, adabn=adabn)
    variables, meta = import_state_dict(sd)
    assert meta["adabn"] is adabn
    assert meta["n_linear"] == 2 and meta["hidden"] == 64
    assert meta["d_e"] == 16 and not meta["prediction"]
    state = to_train_state(variables, meta)

    rng = np.random.default_rng(3)
    emg = rng.standard_normal((4, N_CLASSES, EMG_DIM)).astype(np.float32)
    want = _torch_logits(*nets, emg, adabn=adabn)
    got = _our_logits(state, meta, emg)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_import_checkpoint_file_and_cli(tmp_path):
    """torch.save → cptpu-import CLI → msgpack loads back leaf-equal."""
    from contrastiveprosthetics_tpu.cli.import_ckpt import main as cli_main
    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG
    from contrastiveprosthetics_tpu.train.checkpoint import (
        load_checkpoint,
        template_state,
    )

    nets = _torch_nets(adabn=False, seed=7)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in _state_dict(*nets, adabn=False).items()}
    src = tmp_path / "contrastive.pt"
    torch.save(sd, src)

    state, meta = import_checkpoint(str(src))
    assert meta["dropped_dead"] == ["glove_net.last.0.weight",
                                    "logit_scale"]

    assert cli_main([str(src), "--out", str(tmp_path / "c.msgpack"),
                     "--platform", "cpu"]) == 0
    model = ContrastiveModel(
        d_e=16, adabn=False, n_linear=2, hidden=64, n_classes=N_CLASSES,
    )
    restored = load_checkpoint(
        str(tmp_path / "c.msgpack"), template_state(model, DEFAULT_CONFIG)
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored.params, state.params,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored.batch_stats, state.batch_stats,
    )
    # fresh Adam: zero moments, zero count
    assert all(
        float(jnp.abs(leaf).max()) == 0.0
        for leaf in jax.tree_util.tree_leaves(restored.opt_emg)
    )


def test_import_rejects_bad_layouts(tmp_path):
    from contrastiveprosthetics_tpu.cli.import_ckpt import main as cli_main

    nets = _torch_nets(adabn=True)
    good = _state_dict(*nets, adabn=True)

    with pytest.raises(ImportError_, match="unmapped"):
        import_state_dict({**good, "emg_net.mystery.0.weight":
                           np.zeros((4, 4))})

    wrong = dict(good)
    wrong["glove_net.easy.0.weight"] = np.zeros((7, 9), np.float32)
    variables, meta = import_state_dict(wrong)
    with pytest.raises(ImportError_, match="shape"):
        to_train_state(variables, meta)

    with pytest.raises(ImportError_, match="not a reference"):
        import_state_dict({"something.weight": np.zeros((2, 2))})

    # plain-BN checkpoint missing running stats must fail loudly
    no_stats = {k: v for k, v in _state_dict(
        *_torch_nets(adabn=False), adabn=False
    ).items() if "running" not in k}
    with pytest.raises(ImportError_):
        import_state_dict(no_stats)

    bad = tmp_path / "bad.pt"
    torch.save({"nonsense": torch.zeros(3)}, bad)
    assert cli_main([str(bad), "--platform", "cpu"]) == 2


# --------------------------------------------------------------------------
# slow tier: through the reference's own nets at full width
# --------------------------------------------------------------------------
@pytest.mark.slow
def test_import_differential_reference_nets(ref, tmp_path):
    """File-level import of the reference's actual ``EMGNet``/``GLOVENet``
    state_dict (full width, plain BN with randomized running stats):
    imported forward == torch eval forward on an eval-vote batch — the
    weight-transplant differential, via the public migration path."""
    torch.manual_seed(0)
    T = ref.constants.MAX_TASKS
    ref_emg = ref.models.EMGNet(d_e=16, dp=0.5, adabn=False, device="cpu")
    ref_glove = ref.models.GLOVENet(d_e=16, dp=0.5, adabn=False,
                                    device="cpu")
    for m in list(ref_emg.modules()):
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.normal_(0.0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    ref_emg.eval()
    ref_glove.eval()

    # the FULL GLOVENet state_dict, exactly as a real checkpoint carries it
    # — including the dead contrastive `last` projection (models.py:425-428)
    sd = {f"emg_net.{k}": v for k, v in ref_emg.state_dict().items()}
    sd.update({f"glove_net.{k}": v
               for k, v in ref_glove.state_dict().items()})
    sd["logit_scale"] = torch.zeros(())
    src = tmp_path / "contrastive.pt"
    torch.save(sd, src)

    state, meta = import_checkpoint(str(src))
    assert meta == {
        "adabn": False, "prediction": False, "n_linear": 7, "hidden": 512,
        "d_e": 16, "n_classes": T,
        "dropped_dead": ["glove_net.last.0.weight", "logit_scale"],
    }

    B, W = 2, ref.constants.PREDICTION_WINDOW_SIZE
    rng = np.random.default_rng(17)
    emg_np = rng.standard_normal((B, T, W, EMG_DIM)).astype(np.float32)
    labels = torch.arange(T).repeat(B)
    with torch.no_grad():
        e = ref_emg(torch.from_numpy(emg_np))
        e = e / e.norm(dim=-1, keepdim=True)
        g = ref_glove(torch.zeros(B, T, 20), labels)
        g = g / g.norm(dim=-1, keepdim=True)
        want = torch.bmm(e, g.transpose(1, 2)).numpy()

    model = ContrastiveModel(adabn=False)
    got = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(emg_np), jnp.zeros((B, T, 20)), 0.0, 0.0, False,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
