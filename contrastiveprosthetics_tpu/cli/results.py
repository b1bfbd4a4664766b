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

    from contrastiveprosthetics_tpu.utils.platform import select_platform

    select_platform(args.platform)

    from contrastiveprosthetics_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG, compat_config
    from contrastiveprosthetics_tpu.results.export import export_results
    from contrastiveprosthetics_tpu.train.checkpoint import load_checkpoint
    from contrastiveprosthetics_tpu.train.crossval import (
        best_config,
        hyper_from_key,
        load_crossval,
    )
    from contrastiveprosthetics_tpu.train.engine import Trainer
    from contrastiveprosthetics_tpu.train.loop import run_test

    cfg = compat_config(DEFAULT_CONFIG) if args.compat else DEFAULT_CONFIG

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
        use_fused_encoder=True if args.fused_encoder else None,
    )
    print("Dataset loaded")

    values, keys = load_crossval(args.data_dir, id_=args.crossval_id)
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

    if args.per_subject_eval:
        import numpy as np

        from contrastiveprosthetics_tpu.results.export import (
            export_per_subject,
        )

        ps = trainer.evaluate_per_subject(
            state, jax.random.fold_in(key, 6), hyper, split="test"
        )
        people = cfg.people_mask(db2=args.db2)
        res = export_per_subject(ps, out_dir, people)
        print("per-subject test accuracy (own-batch AdaBN statistics):")
        for pid, a in zip(people, res["per_subject_acc"]):
            print(f"  subject {int(pid)}: {a:.4f}")
        print(f"  mean: {res['mean']:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
