"""Results CLI — parity with the reference's ``results.py`` (same flags as
train, ``results.py:126-143``): rebuild the best crossval config, load the
checkpoint, run the test pass and export the full artifact set including the
set-size sweep and ``results.png``.
"""
from __future__ import annotations

import os

import jax

from contrastiveprosthetics_tpu.cli.train import build_parser, build_store


def main(argv=None):
    p = build_parser()
    args = p.parse_args(argv)

    from contrastiveprosthetics_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG as cfg
    from contrastiveprosthetics_tpu.results.export import export_results
    from contrastiveprosthetics_tpu.train.checkpoint import load_checkpoint
    from contrastiveprosthetics_tpu.train.crossval import (
        best_config,
        hyper_from_key,
        load_crossval,
    )
    from contrastiveprosthetics_tpu.train.engine import Trainer
    from contrastiveprosthetics_tpu.train.loop import run_test

    print("Loading dataset")
    store = build_store(args, cfg)
    trainer = Trainer(
        cfg,
        store,
        db2=args.db2,
        adabn=args.no_adabn,
        prediction=args.prediction,
        glove=args.glove,
        glove_encoding=args.glove_encoding,
        batch_size=args.batch_size,
    )
    print("Dataset loaded")

    values, keys = load_crossval(args.data_dir)
    best_key = best_config(values, keys)
    d_e, hyper = hyper_from_key(best_key)
    if args.load_model:
        hyper = hyper._replace(
            lr_emg=hyper.lr_emg / 10, lr_glove=hyper.lr_glove / 10
        )

    key = jax.random.PRNGKey(args.seed)
    ckpt_path = os.path.join(args.checkpoint_dir, "contrastive.msgpack")
    state = load_checkpoint(
        ckpt_path, trainer.init_state(jax.random.fold_in(key, 2))
    )

    t = run_test(trainer, state, hyper, jax.random.fold_in(key, 5))
    out_dir = args.results_dir or args.data_dir
    summary = export_results(t, out_dir, n_classes=cfg.max_tasks)
    print("loss,\t\t\tcorrect")
    print((float(t.loss), float(t.accuracy)))
    print(f"artifacts exported to {out_dir}")
    print("voting curve (first→last):",
          summary["voting_curve"][0], "→", summary["voting_curve"][-1])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
