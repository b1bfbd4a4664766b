"""Import the reference's torch checkpoint into this framework.

The reference checkpoints ``torch.save(model.state_dict())`` to
``checkpoints/contrastive.pt`` (``train.py:122-126``) and reloads it before
test (``train.py:216``, ``results.py:92-93``). A user migrating from the
reference should not have to retrain to keep a trained model: this module
maps that state_dict onto our flax variable tree (the same functional
mapping proven byte-equivalent in
``tests/test_reference_differential.py::test_encoder_forward_differential``)
and wraps it in a full ``TrainState`` msgpack that ``cptpu-results``,
``cptpu-serve`` and ``cptpu-train --load_model`` consume directly.

Reference key layout (``models.py``):
  * ``emg_net.conv_emg.{0,3}``   Conv2d(1→64→64, 3×3)      (models.py:255-261)
  * ``emg_net.conv_emg.{2,5}``   BatchNorm2d(64)            (models.py:257-262)
  * ``emg_net.linear.{i}``       7× Linear(768/512→512) + BatchNorm1d(512)
                                 interleaved with ReLU/Dropout (models.py:266-298)
  * ``emg_net.last.*``           contrastive: Linear(512→d_e, no bias)
                                 (models.py:312-315); prediction:
                                 Linear(512→128)+BN+Linear(128→41, no bias)
                                 (models.py:300-309)
  * ``glove_net.easy.0``         Linear(n_classes→d_e) one-hot class
                                 embedding (models.py:411-414)
  * ``logit_scale``              dead parameter — multiplication commented
                                 out (models.py:81,129); dropped with a note
  * AdaBN (default): each BN is wrapped, keys end ``.bn.weight`` etc. and
    carry NO running stats (``momentum=0, track_running_stats=False``,
    models.py:17-35). Plain BN (``--no_adabn``): bare keys + running
    mean/var (models.py:238-243).

Layout transforms (torch → flax; see the weight-transplant differential):
  * Conv2d weight (out, in, kh, kw) → NHWC kernel (kh, kw, in, out);
  * torch flattens the conv output channel-major (``(N,64,1,12)`` →
    ``c·12+w``, models.py:263) while our NHWC flatten is position-major
    (``p·64+c``, emg_net.py:51) — the first Linear's input axis is permuted
    by the fixed bijection ``(512, c·W+p) → (p·C+c, 512)``;
  * Linear weight (out, in) → kernel (in, out).
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


class ImportError_(ValueError):
    """A state_dict we cannot map (wrong architecture / unknown keys)."""


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """``torch.load`` a checkpoint file and return float32 numpy leaves.

    Accepts either a bare ``state_dict`` (the reference's format,
    train.py:122-126) or a dict containing one under a ``state_dict`` key.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj \
            and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise ImportError_(f"{path}: not a state_dict (got {type(obj)})")
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


# --------------------------------------------------------------- structure
def _group_modules(sd: Mapping[str, np.ndarray], prefix: str):
    """Group ``prefix.<idx>[.bn].<leaf>`` keys into ordered leaf modules.

    Returns a list of (seq_index, kind, tensors) sorted by index, where
    kind ∈ {"conv", "linear", "bn"} and tensors maps leaf name → array.
    """
    mods: dict[int, dict[str, np.ndarray]] = {}
    pat = re.compile(
        re.escape(prefix) + r"\.(\d+)\.(?:bn\.)?([A-Za-z_]+)$"
    )
    for k, v in sd.items():
        m = pat.match(k)
        if m:
            mods.setdefault(int(m.group(1)), {})[m.group(2)] = v
    out = []
    for idx in sorted(mods):
        t = mods[idx]
        w = t.get("weight")
        if w is None:
            raise ImportError_(f"{prefix}.{idx}: module without a weight")
        if w.ndim == 4:
            kind = "conv"
        elif w.ndim == 2:
            kind = "linear"
        elif w.ndim == 1:
            kind = "bn"
        else:
            raise ImportError_(f"{prefix}.{idx}: weight ndim {w.ndim}")
        out.append((idx, kind, t))
    return out


def classify_state_dict(sd: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Infer the architecture switches a state_dict was saved under."""
    if not any(k.startswith("emg_net.") for k in sd):
        raise ImportError_(
            "no emg_net.* keys — not a reference Model state_dict"
        )
    adabn = any(".bn." in k for k in sd)
    if not adabn and not any(k.endswith("running_mean") for k in sd):
        raise ImportError_(
            "BN keys carry neither the AdaBN '.bn.' wrapper nor running "
            "stats — unrecognized BatchNorm layout"
        )
    last = _group_modules(sd, "emg_net.last")
    linears = [m for m in _group_modules(sd, "emg_net.linear")
               if m[1] == "linear"]
    n_last_linear = sum(1 for _, kind, _ in last if kind == "linear")
    prediction = n_last_linear == 2
    if n_last_linear not in (1, 2):
        raise ImportError_(
            f"emg_net.last has {n_last_linear} linears (expected 1 "
            "contrastive / 2 prediction)"
        )
    head_w = last[-1][2]["weight"]          # (bits, hidden_or_128)
    meta = {
        "adabn": adabn,
        "prediction": prediction,
        "n_linear": len(linears),
        "hidden": int(linears[0][2]["weight"].shape[0]),
        "d_e": None if prediction else int(head_w.shape[0]),
        "n_classes": int(head_w.shape[0]) if prediction else None,
    }
    if not prediction and any(k.startswith("glove_net.easy.") for k in sd):
        meta["n_classes"] = int(sd["glove_net.easy.0.weight"].shape[1])
    return meta


# ----------------------------------------------------------------- mapping
def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch (out, in, kh, kw) → flax NHWC (kh, kw, in, out)."""
    return np.transpose(w, (2, 3, 1, 0))


def _first_dense_kernel(w: np.ndarray, conv_features: int) -> np.ndarray:
    """Un-permute torch's channel-major conv flatten (models.py:263).

    torch input axis is ``c·W + p`` (C=conv_features, W=positions); ours is
    ``p·C + c`` (emg_net.py:51). Fixed bijection, applied to the (out, in)
    weight's input axis, then transposed to (in, out).
    """
    out_f, in_f = w.shape
    positions = in_f // conv_features
    return (
        w.reshape(out_f, conv_features, positions)
        .transpose(2, 1, 0)
        .reshape(in_f, out_f)
    )


def import_state_dict(
    sd: Mapping[str, np.ndarray],
) -> tuple[dict[str, Any], dict[str, Any]]:
    """Map a reference ``Model.state_dict()`` → (variables, meta).

    ``variables`` is ``{"params": ..., "batch_stats": ...}`` in our flax
    naming (emg_net.py / glove_net.py module order); ``meta`` is
    ``classify_state_dict``'s report. ``batch_stats`` is empty under AdaBN
    (the reference's AdaBN carries no running stats, models.py:22) and
    filled from running_mean/var otherwise.
    """
    meta = classify_state_dict(sd)
    f32 = lambda a: np.asarray(a, np.float32)  # noqa: E731

    e_params: dict[str, Any] = {}
    e_stats: dict[str, Any] = {}
    n_conv = n_bn = n_dense = 0

    def put_bn(t):
        nonlocal n_bn
        e_params[f"BatchNorm_{n_bn}"] = {"BatchNorm_0": {
            "scale": f32(t["weight"]), "bias": f32(t["bias"]),
        }}
        if "running_mean" in t:
            e_stats[f"BatchNorm_{n_bn}"] = {"BatchNorm_0": {
                "mean": f32(t["running_mean"]),
                "var": f32(t["running_var"]),
            }}
        n_bn += 1

    conv_features = None
    for _, kind, t in _group_modules(sd, "emg_net.conv_emg"):
        if kind == "conv":
            conv_features = int(t["weight"].shape[0])
            e_params[f"TorchConv_{n_conv}"] = {"Conv_0": {
                "kernel": f32(_conv_kernel(t["weight"])),
                "bias": f32(t["bias"]),
            }}
            n_conv += 1
        elif kind == "bn":
            put_bn(t)

    for _, kind, t in _group_modules(sd, "emg_net.linear"):
        if kind == "linear":
            w = t["weight"]
            if n_dense == 0:
                if conv_features is None:
                    raise ImportError_("linear before any conv_emg conv")
                kernel = _first_dense_kernel(f32(w), conv_features)
            else:
                kernel = f32(w).T
            e_params[f"TorchDense_{n_dense}"] = {"Dense_0": {
                "kernel": kernel, "bias": f32(t["bias"]),
            }}
            n_dense += 1
        elif kind == "bn":
            put_bn(t)

    for _, kind, t in _group_modules(sd, "emg_net.last"):
        if kind == "linear":
            d = {"kernel": f32(t["weight"]).T}
            if "bias" in t:
                d["bias"] = f32(t["bias"])
            e_params[f"TorchDense_{n_dense}"] = {"Dense_0": d}
            n_dense += 1
        elif kind == "bn":
            put_bn(t)

    params: dict[str, Any] = {"emg_net": e_params, "glove_net": {}}
    stats: dict[str, Any] = {"emg_net": e_stats} if e_stats else {}
    if not meta["prediction"]:
        try:
            params["glove_net"]["TorchDense_0"] = {"Dense_0": {
                "kernel": f32(sd["glove_net.easy.0.weight"]).T,
                "bias": f32(sd["glove_net.easy.0.bias"]),
            }}
        except KeyError as e:
            raise ImportError_(f"missing class-encoder key {e}") from e

    dropped = sorted(
        k for k in sd
        if not (k.startswith("emg_net.conv_emg.")
                or k.startswith("emg_net.linear.")
                or k.startswith("emg_net.last.")
                or k.startswith("glove_net.easy.")
                or k == "logit_scale"
                or k.endswith("num_batches_tracked"))
    )
    dead = [k for k in ("logit_scale",) if k in sd]
    if meta["prediction"]:
        # the reference's prediction mode only trains/uses the EMG tower
        # (train.py:101 drives Model.prediction_loss on EMG; its
        # prediction+glove head is dimensionally broken, models.py:416-428)
        # — the GLOVENet towers in the state_dict are untrained init noise.
        meta["dropped_untrained"] = [
            k for k in dropped if k.startswith("glove_net.")
        ]
        dropped = [k for k in dropped if not k.startswith("glove_net.")]
        params["glove_net"] = {}
    else:
        # a real contrastive checkpoint also carries glove_net.last.0.weight:
        # GLOVENet constructs the 256->d_e projection (models.py:425-428) but
        # its contrastive forward uses only `easy` (models.py:457-458) — the
        # tensor's sole gradient is the l2 decay term (models.py:467-471,
        # summed at models.py:227-228), so it is dead weight, dropped with a
        # note like logit_scale.
        glove_dead = [k for k in dropped if k.startswith("glove_net.last.")]
        dead += glove_dead
        dropped = [k for k in dropped if k not in glove_dead]
    if dropped:
        # refuse silently lossy imports
        raise ImportError_(f"unmapped keys: {dropped[:8]}")
    meta["dropped_dead"] = sorted(dead)
    return {"params": params, "batch_stats": stats}, meta


def _flatten(tree, prefix=()):
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def to_train_state(variables: dict[str, Any], meta: dict[str, Any],
                   cfg=None, d_e: int | None = None):
    """Graft imported variables onto a fresh ``TrainState`` template.

    The template is built from a ``ContrastiveModel`` with the switches
    ``classify_state_dict`` inferred, so the result is structurally
    identical to what ``Trainer.init_state`` produces — loadable by every
    consumer (``cptpu-results``, ``cptpu-serve``, ``--load_model``). Every
    imported leaf must match a template leaf in path and shape (a wrong-
    architecture checkpoint fails loudly, never silently). Adam states are
    fresh: the reference checkpoint is weights-only (train.py:122-126);
    ``--load_model`` warm starts re-init Adam at lr/10 exactly as the
    reference does (train.py:68-70). Under AdaBN the template's (unread)
    running stats stay at their init values — the reference's AdaBN carries
    none (models.py:22).
    """
    import jax.numpy as jnp

    from contrastiveprosthetics_tpu.models.clip import ContrastiveModel
    from contrastiveprosthetics_tpu.train.checkpoint import template_state

    if cfg is None:
        from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG as cfg
    model = ContrastiveModel(
        d_e=d_e or meta["d_e"] or 16,
        emg_dim=cfg.emg_dim,
        glove_dim=cfg.glove_dim,
        n_classes=meta["n_classes"] or cfg.max_tasks,
        adabn=meta["adabn"],
        prediction=meta["prediction"],
        n_linear=meta["n_linear"],
        hidden=meta["hidden"],
    )
    tmpl = template_state(model, cfg)

    def graft(tmpl_tree, imported, what):
        t_leaves = dict(_flatten(tmpl_tree))
        i_leaves = dict(_flatten(imported))
        extra = sorted(set(i_leaves) - set(t_leaves))
        if extra:
            raise ImportError_(
                f"{what}: imported leaves not in the model: "
                f"{['/'.join(p) for p in extra[:6]]}"
            )
        for path, leaf in i_leaves.items():
            want = t_leaves[path].shape
            if tuple(leaf.shape) != tuple(want):
                raise ImportError_(
                    f"{what}: {'/'.join(path)} shape {leaf.shape} != "
                    f"model's {want}"
                )
        missing = sorted(set(t_leaves) - set(i_leaves))
        out = dict(t_leaves)
        out.update(i_leaves)
        nested: dict[str, Any] = {}
        for path, leaf in out.items():
            d = nested
            for k in path[:-1]:
                d = d.setdefault(k, {})
            d[path[-1]] = jnp.asarray(leaf, jnp.float32)
        return nested, missing

    params, missing_p = graft(tmpl.params, variables["params"], "params")
    if missing_p:
        raise ImportError_(
            "params: model leaves not covered by the checkpoint: "
            f"{['/'.join(p) for p in missing_p[:6]]}"
        )
    stats, missing_s = graft(
        tmpl.batch_stats, variables.get("batch_stats", {}), "batch_stats"
    )
    if missing_s and not meta["adabn"]:
        raise ImportError_(
            "plain-BN checkpoint without running stats for: "
            f"{['/'.join(p) for p in missing_s[:6]]}"
        )
    import optax

    opt = optax.scale_by_adam()
    return tmpl._replace(
        params=params,
        batch_stats=stats,
        opt_emg=opt.init(params["emg_net"]),
        opt_glove=opt.init(params["glove_net"]),
    )


def import_checkpoint(path: str, cfg=None, d_e: int | None = None):
    """File → (TrainState, meta). The one-call import."""
    sd = load_torch_state_dict(path)
    variables, meta = import_state_dict(sd)
    return to_train_state(variables, meta, cfg=cfg, d_e=d_e), meta
