"""``cptpu-export`` — export a checkpoint as a reference torch checkpoint.

The inverse of ``cptpu-import``: the ``TrainState`` msgpack produced by
``cptpu-train``/``cptpu-import`` becomes a ``Model.state_dict()`` in the
reference's exact key layout, loadable by the reference's own
``model.load_state_dict(torch.load(...))`` (train.py:216, results.py:92-93)
with ``strict=True``::

    cptpu-export checkpoints/contrastive.msgpack \
        --out checkpoints/contrastive.pt

Depth/width/d_e are inferred from the msgpack leaves; ``--no_adabn`` and
``--prediction`` mirror the reference's flags (train.py:251-268) because
neither is inferable from the tree (``train/torch_export.py``). Dead
reference parameters (``logit_scale``, the contrastive glove tower's
unused projection, the prediction mode's untrained glove tower) are
synthesized so the strict load succeeds; the summary names them.
"""
from __future__ import annotations

import argparse
import os
import sys

from contrastiveprosthetics_tpu.utils.platform import (
    add_platform_flag,
    select_platform,
)


def build_parser():
    p = argparse.ArgumentParser(
        prog="cptpu-export", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("src", help="TrainState msgpack (from cptpu-train / "
                               "cptpu-import)")
    p.add_argument("--out", default=None,
                   help="output torch checkpoint path (default: alongside "
                        "src, .msgpack → .pt)")
    p.add_argument("--no_adabn", action="store_false", dest="adabn",
                   help="the checkpoint was trained with plain BatchNorm "
                        "(running stats are exported)")
    p.add_argument("--prediction", action="store_true",
                   help="the checkpoint is a prediction-baseline model")
    p.add_argument("--d_e", type=int, default=None,
                   help="embedding width for the synthesized glove tower "
                        "(prediction mode only; default 16)")
    add_platform_flag(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    select_platform(args.platform)

    from contrastiveprosthetics_tpu.train.torch_export import (
        ExportError_,
        export_checkpoint,
    )

    out = args.out
    if out is None:
        base, _ = os.path.splitext(args.src)
        out = base + ".pt"
    try:
        meta = export_checkpoint(
            args.src, out,
            adabn=args.adabn, prediction=args.prediction, d_e=args.d_e,
        )
    except ExportError_ as e:
        print(f"cptpu-export: cannot express {args.src} in the reference "
              f"layout: {e}", file=sys.stderr)
        return 2

    mode = "prediction" if meta["prediction"] else "contrastive"
    bn = "adabn" if meta["adabn"] else "plain-bn (running stats exported)"
    print(f"exported {args.src} → {out}")
    print(f"  mode={mode} bn={bn} n_linear={meta['n_linear']} "
          f"hidden={meta['hidden']} "
          f"d_e={meta['d_e'] or args.d_e or 16}")
    if meta.get("synthesized"):
        print(f"  synthesized dead reference params: {meta['synthesized']} "
              "(strict load_state_dict needs them; logit_scale's reference "
              "init is exactly 0.0, models.py:81)")
    if meta.get("dropped_ours"):
        print(f"  not exported: {meta['dropped_ours']}")
    print("  note: the reference checkpoint is weights-only "
          "(train.py:122-126) — Adam states do not transfer")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
