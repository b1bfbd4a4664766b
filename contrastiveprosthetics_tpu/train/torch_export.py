"""Export this framework's checkpoint as a reference torch checkpoint.

The inverse of ``train/torch_import.py``: a model trained (or migrated)
here becomes a ``Model.state_dict()`` in the reference's exact key layout
(models.py:248-315,411-428), so ``torch.save`` of the result is loadable by
the reference's own ``model.load_state_dict(torch.load(...))``
(train.py:216, results.py:92-93) with ``strict=True``. Together with
``cptpu-import`` this closes the interop loop — checkpoints round-trip
between the two systems in both directions.

Layout produced (see the import module's docstring for the torch→flax
direction; every transform here is its exact inverse):
  * conv kernels: flax NHWC (kh, kw, in, out) → torch (out, in, kh, kw);
  * first dense: our position-major input axis (``p·C+c``, emg_net.py:51)
    → torch's channel-major conv-flatten axis (``c·W+p``, models.py:263);
  * other dense: (in, out) kernel → (out, in) weight;
  * BatchNorm: AdaBN wraps each BN in a ``.bn`` submodule and carries no
    running stats (models.py:17-35); plain BN is bare and carries
    running_mean/running_var/num_batches_tracked (int64, synthesized 0 —
    torch only reads it for momentum=None, which the reference never uses);
  * Sequential indices: ReLU/Dropout/Flatten own indices but no tensors —
    the index walk reproduces the reference's literal module order,
    including Dropout on the last 4 linear blocks only (models.py:266-298;
    the same rule our EMGNet applies, emg_net.py:57).

Dead reference parameters the checkpoint must still carry for a strict
load are synthesized and reported in ``meta``:
  * ``logit_scale`` — its multiplication is commented out (models.py:81,
    129); synthesized at the reference's own init value, which is exactly
    0.0 (``torch.ones([]) * np.log(1)/0.07`` — log(1) = 0);
  * ``glove_net.last.0.weight`` (contrastive) — constructed
    (models.py:425-428) but never called in the contrastive forward
    (models.py:457-458); its only gradient is l2 decay, so zeros = the
    fully-decayed fixed point;
  * the whole glove tower (prediction) — the reference's prediction mode
    trains the EMG tower only (train.py:101) and its prediction+glove head
    is dimensionally broken (models.py:416-428), so a real checkpoint
    carries untrained init noise there; we synthesize inoffensive values
    (zero weights, identity BN).

Models with no reference equivalent (``--glove_encoding``) fail loudly.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np


class ExportError_(ValueError):
    """A variable tree we cannot express as a reference state_dict."""


# ------------------------------------------------------------------ helpers
def _conv_weight(kernel: np.ndarray) -> np.ndarray:
    """flax NHWC (kh, kw, in, out) → torch (out, in, kh, kw)."""
    return np.transpose(kernel, (3, 2, 0, 1))


def _first_dense_weight(kernel: np.ndarray, conv_features: int) -> np.ndarray:
    """Inverse of ``torch_import._first_dense_kernel``.

    Our (in, out) kernel's input axis is position-major ``p·C+c``
    (emg_net.py:51); torch's (out, in) weight input axis is channel-major
    ``c·W+p`` (models.py:263). Verified bijective by the roundtrip tests.
    """
    in_f, out_f = kernel.shape
    positions = in_f // conv_features
    return (
        kernel.reshape(positions, conv_features, out_f)
        .transpose(2, 1, 0)
        .reshape(out_f, in_f)
    )


def _nat(prefix: str):
    """Sort ``{prefix}_{i}`` keys by the integer suffix."""
    def key(name: str) -> int:
        return int(name.rsplit("_", 1)[1])
    return key


def _modules(tree: Mapping[str, Any], kind: str) -> list[dict[str, Any]]:
    names = sorted((n for n in tree if n.startswith(kind + "_")),
                   key=_nat(kind))
    inner = {"TorchConv": "Conv_0", "TorchDense": "Dense_0",
             "BatchNorm": "BatchNorm_0"}[kind]
    return [dict(tree[n][inner]) for n in names]


def _f32(a) -> np.ndarray:
    return np.asarray(a, np.float32)


# ------------------------------------------------------------------- export
def export_state_dict(
    params: Mapping[str, Any],
    batch_stats: Mapping[str, Any],
    *,
    adabn: bool,
    prediction: bool,
    d_e: int | None = None,
) -> tuple[dict[str, np.ndarray], dict[str, Any]]:
    """flax variables → (reference-layout state_dict, meta).

    ``params``/``batch_stats`` are our variable trees (``TrainState``
    fields or ``msgpack_restore`` output — both are plain nested dicts of
    the same shape). ``adabn``/``prediction`` cannot be inferred from the
    tree (flax creates running-stats variables either way and the
    depth-vs-head ambiguity is unresolvable from leaf counts alone), so
    they are explicit, defaulting at the CLI to the reference's defaults.
    """
    emg_p = params.get("emg_net") or {}
    glove_p = params.get("glove_net") or {}
    emg_s = (batch_stats or {}).get("emg_net") or {}

    convs = _modules(emg_p, "TorchConv")
    denses = _modules(emg_p, "TorchDense")
    bns = _modules(emg_p, "BatchNorm")
    bn_stats = _modules(emg_s, "BatchNorm") if emg_s else []

    if len(convs) != 2:
        raise ExportError_(f"expected 2 emg convs, found {len(convs)}")
    n_head_dense = 2 if prediction else 1
    n_linear = len(denses) - n_head_dense
    if n_linear < 1:
        raise ExportError_(
            f"{len(denses)} emg denses cannot hold a "
            f"{'prediction' if prediction else 'contrastive'} head"
        )
    want_bn = 2 + n_linear + (1 if prediction else 0)
    if len(bns) != want_bn:
        raise ExportError_(
            f"{len(bns)} emg BatchNorms inconsistent with n_linear="
            f"{n_linear} {'prediction' if prediction else 'contrastive'} "
            f"(expected {want_bn}) — is --prediction right?"
        )
    if not adabn and len(bn_stats) != len(bns):
        raise ExportError_(
            "plain-BN export needs running stats for every BatchNorm "
            f"(have {len(bn_stats)}/{len(bns)})"
        )

    conv_features = int(convs[0]["kernel"].shape[3])
    hidden = int(denses[0]["kernel"].shape[1])
    # the BN census alone cannot distinguish (n_linear, prediction) from
    # (n_linear+1, contrastive) — the widths can: every mid block outputs
    # ``hidden`` and the prediction head's first dense outputs 128
    # (models.py:303); a wrong --prediction flag trips one of these
    for i in range(1, n_linear):
        got_w = int(denses[i]["kernel"].shape[1])
        if got_w != hidden:
            raise ExportError_(
                f"linear block {i} outputs {got_w} != hidden {hidden} — "
                "is --prediction right?"
            )
    if prediction:
        pre = denses[n_linear]
        if int(pre["kernel"].shape[1]) != 128 or "bias" not in pre:
            raise ExportError_(
                "prediction head's first dense must be a biased →128 "
                "projection (models.py:303) — is --prediction right?"
            )
    head_w = denses[-1]["kernel"]
    if "bias" in denses[-1]:
        raise ExportError_(
            "final emg dense carries a bias — the reference's head is "
            "bias-free (models.py:308,314); not a reference-shaped model"
        )
    meta: dict[str, Any] = {
        "adabn": adabn, "prediction": prediction, "n_linear": n_linear,
        "hidden": hidden,
        "d_e": None if prediction else int(head_w.shape[1]),
        "n_classes": int(head_w.shape[1]) if prediction else None,
        "synthesized": [],
    }

    sd: dict[str, np.ndarray] = {}

    def put_bn(prefix: str, i_bn: int, idx: int):
        mid = f"{prefix}.{idx}.bn." if adabn else f"{prefix}.{idx}."
        sd[mid + "weight"] = _f32(bns[i_bn]["scale"])
        sd[mid + "bias"] = _f32(bns[i_bn]["bias"])
        if not adabn:
            sd[mid + "running_mean"] = _f32(bn_stats[i_bn]["mean"])
            sd[mid + "running_var"] = _f32(bn_stats[i_bn]["var"])
            sd[mid + "num_batches_tracked"] = np.array(0, np.int64)

    # conv_emg: Conv@0, ReLU@1, BN@2, Conv@3, ReLU@4, BN@5, Flatten@6
    # (models.py:248-264)
    for j, idx in enumerate((0, 3)):
        sd[f"emg_net.conv_emg.{idx}.weight"] = _conv_weight(
            _f32(convs[j]["kernel"])
        )
        sd[f"emg_net.conv_emg.{idx}.bias"] = _f32(convs[j]["bias"])
        put_bn("emg_net.conv_emg", j, idx + 2)

    # linear: per block Linear, ReLU, BN (+ Dropout on the last 4 blocks,
    # models.py:266-298) — Dropout holds no tensors but owns an index
    idx = 0
    for i in range(n_linear):
        d = denses[i]
        w = _f32(d["kernel"])
        w = (_first_dense_weight(w, conv_features) if i == 0 else w.T)
        sd[f"emg_net.linear.{idx}.weight"] = w
        sd[f"emg_net.linear.{idx}.bias"] = _f32(d["bias"])
        put_bn("emg_net.linear", 2 + i, idx + 2)
        idx += 3 + (1 if i >= n_linear - 4 else 0)

    if prediction:
        # last: Linear@0, ReLU@1, BN@2, Linear@3 (no Dropout — commented
        # out, models.py:302-309)
        sd["emg_net.last.0.weight"] = _f32(denses[n_linear]["kernel"]).T
        sd["emg_net.last.0.bias"] = _f32(denses[n_linear]["bias"])
        put_bn("emg_net.last", 2 + n_linear, 2)
        sd["emg_net.last.3.weight"] = _f32(head_w).T
    else:
        sd["emg_net.last.0.weight"] = _f32(head_w).T  # models.py:312-315

    # ---------------------------------------------------------- glove_net
    if prediction:
        # the reference's prediction checkpoint carries an untrained glove
        # tower (train.py:101 never drives it); synthesize inoffensively
        d_e = int(d_e or 16)
        n_classes = meta["n_classes"]
        synth = _synth_prediction_glove(d_e, n_classes, adabn)
        sd.update(synth)
        meta["synthesized"] = sorted(synth)
        if glove_p:
            # our prediction-mode glove MLP is 20→128→n (the evident
            # intent of the broken reference head, glove_net.py:41-47) —
            # dimensionally inexpressible in the reference layout
            meta["dropped_ours"] = ["glove_net (20-d MLP, no reference "
                                    "equivalent; synthesized instead)"]
    else:
        g_denses = _modules(glove_p, "TorchDense")
        if len(g_denses) != 1 or _modules(glove_p, "BatchNorm"):
            raise ExportError_(
                "glove_net is not the one-hot 'easy' embedding "
                "(models.py:411-414) — glove_encoding models have no "
                "reference equivalent"
            )
        easy = g_denses[0]
        if int(easy["kernel"].shape[1]) != int(head_w.shape[1]):
            raise ExportError_(
                f"glove embedding width {easy['kernel'].shape[1]} != emg "
                f"d_e {head_w.shape[1]}"
            )
        if int(easy["kernel"].shape[0]) == 20:
            raise ExportError_(
                "glove_net input width 20 — a glove_encoding model, which "
                "has no reference equivalent"
            )
        sd["glove_net.easy.0.weight"] = _f32(easy["kernel"]).T
        sd["glove_net.easy.0.bias"] = _f32(easy["bias"])
        # dead 256→d_e projection a real checkpoint carries
        # (models.py:425-428; never called, models.py:457-458)
        de = int(head_w.shape[1])
        sd["glove_net.last.0.weight"] = np.zeros((de, 256), np.float32)
        meta["synthesized"].append("glove_net.last.0.weight")

    # dead CLIP temperature; reference init is exactly 0.0
    # (torch.ones([]) * np.log(1)/0.07, models.py:81 — log(1) = 0)
    sd["logit_scale"] = np.zeros((), np.float32)
    meta["synthesized"].append("logit_scale")
    meta["synthesized"].sort()
    return sd, meta


def _synth_prediction_glove(d_e: int, n_classes: int, adabn: bool):
    """The reference prediction-mode GLOVENet's full (untrained) key set:
    easy = Linear(MAX_TASKS_TRAIN, d_e) (models.py:412-414); last =
    Linear(256,128)@0, ReLU@1, BN@2, Dropout@3, Linear(128,bits)@4
    (models.py:416-423)."""
    sd = {
        "glove_net.easy.0.weight": np.zeros((d_e, n_classes), np.float32),
        "glove_net.easy.0.bias": np.zeros((d_e,), np.float32),
        "glove_net.last.0.weight": np.zeros((128, 256), np.float32),
        "glove_net.last.0.bias": np.zeros((128,), np.float32),
        "glove_net.last.4.weight": np.zeros((n_classes, 128), np.float32),
    }
    mid = "glove_net.last.2.bn." if adabn else "glove_net.last.2."
    sd[mid + "weight"] = np.ones((128,), np.float32)
    sd[mid + "bias"] = np.zeros((128,), np.float32)
    if not adabn:
        sd[mid + "running_mean"] = np.zeros((128,), np.float32)
        sd[mid + "running_var"] = np.ones((128,), np.float32)
        sd[mid + "num_batches_tracked"] = np.array(0, np.int64)
    return sd


# --------------------------------------------------------------- file-level
def export_checkpoint(
    src: str,
    out: str,
    *,
    adabn: bool = True,
    prediction: bool = False,
    d_e: int | None = None,
) -> dict[str, Any]:
    """msgpack ``TrainState`` file → ``torch.save``-d reference checkpoint.

    Reads the raw msgpack tree (no template needed — the architecture is
    inferred from the leaves, exactly like ``cptpu-import`` infers it from
    the state_dict), converts, and saves torch tensors.
    """
    import torch
    from flax import serialization

    with open(src, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if not isinstance(raw, Mapping) or "params" not in raw:
        raise ExportError_(f"{src}: not a TrainState msgpack")
    sd, meta = export_state_dict(
        raw["params"], raw.get("batch_stats") or {},
        adabn=adabn, prediction=prediction, d_e=d_e,
    )
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, out)
    return meta
