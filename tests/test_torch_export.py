"""Tests for ``cptpu-export`` — checkpoints back to the reference's torch
format (``train/torch_export.py``).

The strict-load contract is the point: the exported dict must be accepted
by ``load_state_dict(strict=True)`` on a module tree with the reference's
exact Sequential indices (Dropout/ReLU own indices but no tensors —
models.py:266-298), the AdaBN ``.bn.`` wrapper (models.py:17-35), and the
dead parameters a real checkpoint carries (logit_scale, the contrastive
glove tower's unused 256→d_e projection).

Fast tier: torch twins mirroring the reference layout at narrow widths —
strict load + numeric forward parity, import/export roundtrips, loud
failures. Slow tier: strict load into the reference's actual
``EMGNet``/``GLOVENet`` at full width + forward differential.
"""
from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from test_reference_differential import ref  # noqa: F401
from test_torch_import import _our_logits

from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG
from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
from contrastiveprosthetics_tpu.train.checkpoint import (
    save_checkpoint,
    template_state,
)
from contrastiveprosthetics_tpu.train.torch_export import (
    ExportError_,
    export_state_dict,
)
from contrastiveprosthetics_tpu.train.torch_import import import_state_dict

N_CLASSES = 41
EMG_DIM = 12


# --------------------------------------------------------------------------
# torch twins with the REFERENCE's module indices (incl. Dropout slots)
# --------------------------------------------------------------------------
class _Ada1d(torch.nn.Module):
    """The reference's AdaBatchNorm1d (models.py:17-25): a ``.bn``-wrapped
    BatchNorm with no running stats — batch statistics in every mode."""

    def __init__(self, n):
        super().__init__()
        self.bn = torch.nn.BatchNorm1d(
            n, momentum=0, track_running_stats=False
        )

    def forward(self, x):
        return self.bn(x)


class _Ada2d(torch.nn.Module):
    def __init__(self, n):
        super().__init__()
        self.bn = torch.nn.BatchNorm2d(
            n, momentum=0, track_running_stats=False
        )

    def forward(self, x):
        return self.bn(x)


class _TwinEMG(torch.nn.Module):
    """EMGNet's exact Sequential layout (models.py:248-315) at any
    depth/width: Dropout on the last 4 linear blocks (same rule as
    emg_net.py:57), prediction head without Dropout (models.py:302-309)."""

    def __init__(self, adabn, n_linear, hidden, d_e, prediction=False):
        super().__init__()
        bn1 = _Ada1d if adabn else torch.nn.BatchNorm1d
        bn2 = _Ada2d if adabn else torch.nn.BatchNorm2d
        self.conv_emg = torch.nn.Sequential(
            torch.nn.Conv2d(1, 64, (3, 3), padding=(1, 1)),
            torch.nn.ReLU(), bn2(64),
            torch.nn.Conv2d(64, 64, (3, 3), padding=(1, 1)),
            torch.nn.ReLU(), bn2(64),
            torch.nn.Flatten(),
        )
        blocks, in_f = [], EMG_DIM * 64
        for i in range(n_linear):
            blocks += [torch.nn.Linear(in_f, hidden), torch.nn.ReLU(),
                       bn1(hidden)]
            if i >= n_linear - 4:
                blocks.append(torch.nn.Dropout(0.5))
            in_f = hidden
        self.linear = torch.nn.Sequential(*blocks)
        if prediction:
            self.last = torch.nn.Sequential(
                torch.nn.Linear(hidden, 128), torch.nn.ReLU(), bn1(128),
                torch.nn.Linear(128, N_CLASSES, bias=False),
            )
        else:
            self.last = torch.nn.Sequential(
                torch.nn.Linear(hidden, d_e, bias=False),
            )

    def forward(self, x):
        return self.last(self.linear(self.conv_emg(x)))


class _TwinGlove(torch.nn.Module):
    """GLOVENet's parametric modules (models.py:411-428)."""

    def __init__(self, adabn, d_e, prediction=False):
        super().__init__()
        bn1 = _Ada1d if adabn else torch.nn.BatchNorm1d
        self.easy = torch.nn.Sequential(torch.nn.Linear(N_CLASSES, d_e))
        if prediction:
            self.last = torch.nn.Sequential(
                torch.nn.Linear(256, 128), torch.nn.ReLU(), bn1(128),
                torch.nn.Dropout(0.5),
                torch.nn.Linear(128, N_CLASSES, bias=False),
            )
        else:
            self.last = torch.nn.Sequential(
                torch.nn.Linear(256, d_e, bias=False),
            )

    def forward(self, hot):
        return self.easy(hot)


class _TwinModel(torch.nn.Module):
    """Model = emg_net + glove_net + logit_scale (models.py:66-82)."""

    def __init__(self, adabn, n_linear=2, hidden=64, d_e=16,
                 prediction=False):
        super().__init__()
        self.emg_net = _TwinEMG(adabn, n_linear, hidden, d_e, prediction)
        self.glove_net = _TwinGlove(adabn, d_e, prediction)
        self.logit_scale = torch.nn.Parameter(torch.zeros(()))


# --------------------------------------------------------------------------
# a non-trivial state to export
# --------------------------------------------------------------------------
def _random_state(model, seed=0):
    st = template_state(model, DEFAULT_CONFIG)
    rng = np.random.default_rng(seed)

    def rnd_param(leaf):
        return jnp.asarray(
            rng.standard_normal(leaf.shape) * 0.1, jnp.float32
        )

    def rnd_stat(path, leaf):
        name = path[-1].key
        if name == "var":
            return jnp.asarray(
                rng.uniform(0.5, 1.5, leaf.shape), jnp.float32
            )
        return jnp.asarray(
            rng.normal(0.0, 0.2, leaf.shape), jnp.float32
        )

    return st._replace(
        params=jax.tree_util.tree_map(rnd_param, st.params),
        batch_stats=jax.tree_util.tree_map_with_path(
            rnd_stat, st.batch_stats
        ),
    )


def _twin_logits(twin, emg_np, d_e):
    """The reference's contrastive eval forward (models.py:112-130) on the
    twin. ``.eval()`` everywhere: AdaBN's stat-less BatchNorm uses batch
    statistics in eval mode too (track_running_stats=False), and Dropout
    is off — matching our ``train=False`` forward."""
    twin.eval()
    B, T, _ = emg_np.shape
    with torch.no_grad():
        x = torch.from_numpy(emg_np.reshape(-1, 1, 1, EMG_DIM))
        e = twin.emg_net(x).reshape(B, T, d_e)
        e = e / e.norm(dim=-1, keepdim=True)
        hot = torch.nn.functional.one_hot(
            torch.arange(T).repeat(B), N_CLASSES
        ).float()
        g = twin.glove_net(hot).reshape(B, T, d_e)
        g = g / g.norm(dim=-1, keepdim=True)
        return torch.bmm(e, g.transpose(1, 2)).numpy()


# --------------------------------------------------------------------------
# fast tier
# --------------------------------------------------------------------------
@pytest.mark.parametrize("adabn", [True, False])
def test_export_strict_loads_and_matches_torch(adabn):
    """Export → strict load into a reference-layout twin → torch forward
    == our forward. Strictness proves the key set (incl. Dropout index
    shifts, the .bn. wrapper, running stats, and synthesized dead params)
    is exactly what the reference's load_state_dict demands."""
    model = ContrastiveModel(
        d_e=16, adabn=adabn, n_linear=2, hidden=64, n_classes=N_CLASSES,
    )
    state = _random_state(model, seed=11)
    sd, meta = export_state_dict(
        state.params, state.batch_stats, adabn=adabn, prediction=False,
    )
    assert meta["n_linear"] == 2 and meta["hidden"] == 64
    assert meta["d_e"] == 16
    assert meta["synthesized"] == ["glove_net.last.0.weight",
                                   "logit_scale"]

    twin = _TwinModel(adabn)
    twin.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()},
        strict=True,
    )

    rng = np.random.default_rng(5)
    emg = rng.standard_normal((4, N_CLASSES, EMG_DIM)).astype(np.float32)
    want = _twin_logits(twin, emg, d_e=16)
    got = _our_logits(state, meta, emg)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("adabn", [True, False])
def test_export_import_roundtrip(adabn):
    """import(export(state)) reproduces every param/stat leaf exactly —
    the transforms are transposes/permutations, so equality is bitwise."""
    model = ContrastiveModel(
        d_e=16, adabn=adabn, n_linear=3, hidden=32, n_classes=N_CLASSES,
    )
    state = _random_state(model, seed=3)
    sd, _ = export_state_dict(
        state.params, state.batch_stats, adabn=adabn, prediction=False,
    )
    variables, meta = import_state_dict(sd)
    assert meta["adabn"] is adabn
    assert meta["n_linear"] == 3 and meta["hidden"] == 32

    tm = jax.tree_util.tree_map
    tm(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
       variables["params"], state.params)
    if not adabn:
        tm(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
           variables["batch_stats"],
           jax.tree_util.tree_map(np.asarray, state.batch_stats))


def test_export_cli_file_cycle(tmp_path):
    """msgpack → cptpu-export → .pt → cptpu-import → msgpack: the two
    CLIs compose into a lossless round trip for the trained weights."""
    from contrastiveprosthetics_tpu.cli.export_ckpt import main as export_cli
    from contrastiveprosthetics_tpu.cli.import_ckpt import main as import_cli
    from contrastiveprosthetics_tpu.train.checkpoint import load_checkpoint

    model = ContrastiveModel(
        d_e=16, adabn=False, n_linear=2, hidden=64, n_classes=N_CLASSES,
    )
    state = _random_state(model, seed=23)
    src = tmp_path / "trained.msgpack"
    save_checkpoint(str(src), state)

    pt = tmp_path / "contrastive.pt"
    assert export_cli([str(src), "--out", str(pt), "--no_adabn",
                       "--platform", "cpu"]) == 0
    assert pt.exists()

    back = tmp_path / "back.msgpack"
    assert import_cli([str(pt), "--out", str(back),
                       "--platform", "cpu"]) == 0
    restored = load_checkpoint(str(back), template_state(model,
                                                         DEFAULT_CONFIG))
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


def test_export_prediction_key_set_and_roundtrip():
    """Prediction-mode export: key set == a reference-layout prediction
    twin's state_dict (strict load), EMG tower values roundtrip; the
    synthesized glove tower is reported."""
    model = ContrastiveModel(
        d_e=16, adabn=True, n_linear=2, hidden=64, n_classes=N_CLASSES,
        prediction=True,
    )
    state = _random_state(model, seed=7)
    sd, meta = export_state_dict(
        state.params, state.batch_stats, adabn=True, prediction=True,
        d_e=16,
    )
    assert meta["prediction"] and meta["n_classes"] == N_CLASSES
    assert any(k.startswith("glove_net.") for k in meta["synthesized"])

    twin = _TwinModel(adabn=True, prediction=True)
    twin.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()},
        strict=True,
    )

    variables, imeta = import_state_dict(sd)
    assert imeta["prediction"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables["params"]["emg_net"], state.params["emg_net"],
    )


def test_export_rejects_inexpressible_models(tmp_path):
    from contrastiveprosthetics_tpu.cli.export_ckpt import main as export_cli

    # glove_encoding: 20-d input MLP — no reference equivalent
    ge = ContrastiveModel(
        d_e=16, adabn=True, n_linear=2, hidden=64, n_classes=N_CLASSES,
        glove_encoding=True,
    )
    st = _random_state(ge, seed=1)
    with pytest.raises(ExportError_, match="glove_encoding|one-hot"):
        export_state_dict(st.params, st.batch_stats,
                          adabn=True, prediction=False)

    # wrong --prediction flag: BN census mismatch fails loudly
    ok = ContrastiveModel(
        d_e=16, adabn=True, n_linear=2, hidden=64, n_classes=N_CLASSES,
    )
    st2 = _random_state(ok, seed=2)
    with pytest.raises(ExportError_):
        export_state_dict(st2.params, st2.batch_stats,
                          adabn=True, prediction=True)

    # plain-BN export without stats fails loudly
    with pytest.raises(ExportError_, match="running stats"):
        export_state_dict(st2.params, {}, adabn=False, prediction=False)

    # CLI: a non-TrainState msgpack exits 2
    bad = tmp_path / "bad.msgpack"
    bad.write_bytes(b"\x81\xa3foo\xa3bar")  # msgpack {"foo": "bar"}
    assert export_cli([str(bad), "--platform", "cpu"]) == 2


# --------------------------------------------------------------------------
# slow tier: strict load into the reference's own nets at full width
# --------------------------------------------------------------------------
@pytest.mark.slow
@pytest.mark.parametrize("adabn", [True, False])
def test_export_strict_loads_into_reference_nets(ref, adabn, monkeypatch):
    """The certification: a full-width export strict-loads into the
    reference's actual ``EMGNet``/``GLOVENet`` (models.py:230-472) and the
    reference's eval forward equals ours. Model adds only logit_scale on
    top of the two nets (models.py:66-82), which the export carries."""
    if adabn:
        # the reference's AdaBatchNorm hardcodes .to("cuda") in its own
        # __init__ (models.py:19-25) regardless of the net's device arg;
        # redirect it to cpu for this process only
        for cls in (ref.models.AdaBatchNorm1d, ref.models.AdaBatchNorm2d):
            orig = cls.__init__
            monkeypatch.setattr(
                cls, "__init__",
                (lambda o: lambda self, n, device="cpu":
                    o(self, n, device="cpu"))(orig),
            )
    model = ContrastiveModel(adabn=adabn)  # full width, d_e=16
    state = _random_state(model, seed=42)
    sd, meta = export_state_dict(
        state.params, state.batch_stats, adabn=adabn, prediction=False,
    )
    assert meta["n_linear"] == 7 and meta["hidden"] == 512

    ref_emg = ref.models.EMGNet(d_e=16, dp=0.5, adabn=adabn, device="cpu")
    ref_glove = ref.models.GLOVENet(d_e=16, dp=0.5, adabn=adabn,
                                    device="cpu")
    t = {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}
    ref_emg.load_state_dict(
        {k.removeprefix("emg_net."): v for k, v in t.items()
         if k.startswith("emg_net.")}, strict=True)
    ref_glove.load_state_dict(
        {k.removeprefix("glove_net."): v for k, v in t.items()
         if k.startswith("glove_net.")}, strict=True)
    assert "logit_scale" in sd
    ref_emg.eval()
    ref_glove.eval()

    B, T = 2, N_CLASSES
    W = ref.constants.PREDICTION_WINDOW_SIZE
    rng = np.random.default_rng(9)
    emg_np = rng.standard_normal((B, T, W, EMG_DIM)).astype(np.float32)
    labels = torch.arange(T).repeat(B)
    with torch.no_grad():
        e = ref_emg(torch.from_numpy(emg_np))
        e = e / e.norm(dim=-1, keepdim=True)
        g = ref_glove(torch.zeros(B, T, 20), labels)
        g = g / g.norm(dim=-1, keepdim=True)
        want = torch.bmm(e, g.transpose(1, 2)).numpy()

    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(emg_np), jnp.zeros((B, T, 20)), 0.0, 0.0, False,
        mutable=["batch_stats"] if adabn else False,
    )
    got = np.asarray(out[0] if adabn else out)
    # AdaBN normalizes with current-batch statistics computed over the
    # 2·41·25-row batch — the f32 reduction order differs between torch
    # and XLA, so the adabn leg needs a slightly wider absolute band
    # (observed max |Δ| ≈ 1e-4 on unit-normalized logits)
    np.testing.assert_allclose(got, want, rtol=2e-4,
                               atol=2e-4 if adabn else 2e-5)
