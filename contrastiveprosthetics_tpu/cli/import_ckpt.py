"""``cptpu-import`` — migrate a reference torch checkpoint into this
framework.

The reference saves ``torch.save(model.state_dict())`` to
``checkpoints/contrastive.pt`` (train.py:122-126). This converts it to the
``TrainState`` msgpack every consumer here loads (``cptpu-results``,
``cptpu-serve --checkpoint``, ``cptpu-train --load_model``), so a trained
reference model keeps working without retraining::

    cptpu-import checkpoints/contrastive.pt \
        --out checkpoints/contrastive.msgpack

Architecture switches (AdaBN vs plain BN, contrastive vs prediction head,
depth/width/d_e) are inferred from the state_dict itself; mismatched or
unknown layouts fail loudly (``train/torch_import.py``).
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
        prog="cptpu-import", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    p.add_argument("src", help="reference torch checkpoint "
                               "(checkpoints/contrastive.pt)")
    p.add_argument("--out", default=None,
                   help="output msgpack path (default: alongside src, "
                        ".pt → .msgpack)")
    p.add_argument("--d_e", type=int, default=None,
                   help="override the inferred embedding width (prediction-"
                        "mode checkpoints carry no d_e)")
    add_platform_flag(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    select_platform(args.platform)

    from contrastiveprosthetics_tpu.train.checkpoint import save_checkpoint
    from contrastiveprosthetics_tpu.train.torch_import import (
        ImportError_,
        import_checkpoint,
    )

    out = args.out
    if out is None:
        base, _ = os.path.splitext(args.src)
        out = base + ".msgpack"
    try:
        state, meta = import_checkpoint(args.src, d_e=args.d_e)
    except ImportError_ as e:
        print(f"cptpu-import: cannot map {args.src}: {e}", file=sys.stderr)
        return 2
    save_checkpoint(out, state)

    n_params = sum(
        leaf.size for leaf in __import__("jax").tree_util.tree_leaves(
            state.params
        )
    )
    mode = "prediction" if meta["prediction"] else "contrastive"
    bn = "adabn" if meta["adabn"] else "plain-bn (running stats imported)"
    print(f"imported {args.src} → {out}")
    print(f"  mode={mode} bn={bn} n_linear={meta['n_linear']} "
          f"hidden={meta['hidden']} d_e={args.d_e or meta['d_e']} "
          f"params={n_params:,}")
    if meta.get("dropped_dead"):
        print(f"  dropped dead reference params: {meta['dropped_dead']} "
              "(logit_scale's multiplication is commented out, "
              "models.py:81,129; the contrastive glove tower never calls "
              "`last`, models.py:425-428,457-458)")
    if meta.get("dropped_untrained"):
        print(f"  dropped {len(meta['dropped_untrained'])} untrained "
              "glove-tower tensors (prediction mode trains the EMG tower "
              "only, train.py:101)")
    print("  Adam states are fresh (the reference checkpoint is "
          "weights-only, train.py:122-126)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
