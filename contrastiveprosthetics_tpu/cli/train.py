"""Training CLI — flag-for-flag parity with the reference's ``train.py``
(``train.py:251-268``; ``--no_*`` flags are ``store_false``: passing them
*disables* the feature). New flags are additive: ``--data_dir``,
``--checkpoint_dir``, ``--synthetic`` (run on fabricated data),
``--crossval_chunk`` (vmap group size), ``--seed``, ``--profile``.

Flow mirrors ``train.py:168-249``: load store → crossval (or ``--crossval_load``)
→ pick nanargmax-val-acc config → final annealed train with checkpointing →
reload best checkpoint → optional test.
"""
from __future__ import annotations

import argparse
import os
import time

import jax

from contrastiveprosthetics_tpu.utils.platform import (
    add_platform_flag,
    select_platform,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Training on ninapro dataset")
    # --- reference flags (train.py:251-268) ---
    p.add_argument("--crossval_size", type=int, default=10)
    p.add_argument("--crossval_epochs", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--final_epochs", type=int, default=10)
    p.add_argument("--glove", action="store_true")
    p.add_argument("--db2", action="store_true")
    p.add_argument("--load_model", action="store_true")
    p.add_argument("--crossval_load", action="store_true")
    p.add_argument("--prediction", action="store_true")
    p.add_argument("--no_adabn", action="store_false")
    p.add_argument("--no_checkpoint", action="store_false")
    p.add_argument("--no_verbose", action="store_false")
    p.add_argument("--test", action="store_true")
    # --- additive flags ---
    p.add_argument("--data_dir", type=str, default="data")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--results_dir", type=str, default=None,
                   help="export full artifact set after --test")
    p.add_argument("--synthetic", action="store_true",
                   help="train on fabricated class-separable data")
    p.add_argument("--glove_encoding", action="store_true",
                   help="encode real glove angles as class embeddings")
    p.add_argument("--crossval_chunk", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--profile", action="store_true")
    p.add_argument("--pallas_loss", action="store_true",
                   help="fused Pallas similarity+CE kernel")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 encoder compute (mixed precision)")
    p.add_argument("--fused_encoder", action="store_true",
                   help="plain-BN contrastive eval runs the whole encoder+"
                        "similarity as ONE Pallas kernel with VMEM-resident"
                        " weights (ops/pallas_ops.py §2; interpret mode "
                        "off-TPU)")
    p.add_argument("--fused_train", type=str, default="auto",
                   choices=("auto", "on", "off"),
                   help="fused Pallas training chain for the dense stack "
                        "(ops/train_fused.py: BN statistics ride the GEMM "
                        "tiles, dropout masks from the TPU hardware PRNG). "
                        "auto = the recorded A/B default (engine.Trainer."
                        "use_fused_train); contrastive mode only")
    p.add_argument("--compat", action="store_true",
                   help="reproduce every reference quirk (uint8 time mask, "
                        "complete stats, shared StepLR, 249-col voting)")
    p.add_argument("--spmd_crossval", action="store_true",
                   help="shard the crossval config axis over all visible "
                        "devices (jax.sharding Mesh over ICI; zero "
                        "inter-chip traffic — each chip trains its own "
                        "config slice). No-op on a single device")
    p.add_argument("--per_subject_eval", action="store_true",
                   help="after --test, also evaluate each subject in its "
                        "own batch (true per-subject AdaBN statistics — "
                        "the reference's stated intent, models.py:245, "
                        "which its mixed-subject batches never deliver) "
                        "and report/export per-subject accuracy")
    p.add_argument("--prng_impl", type=str, default="auto",
                   choices=("auto", "threefry2x32", "rbg", "unsafe_rbg"),
                   help="PRNG for all random streams (dropout, shuffles, "
                        "init). auto = the TPU hardware RNG (rbg) on TPU "
                        "(+37%% train throughput, the reference's torch "
                        "path uses cuRAND hardware RNG too), threefry "
                        "elsewhere. threefry2x32 gives streams stable "
                        "across backends/versions (and byte-identical to "
                        "pre-flip runs). JAX typed keys carry the impl "
                        "through every split/fold_in unchanged")
    p.add_argument("--crossval_id", type=str, default="",
                   help="suffix for cross_val_{keys,values}<id>.npy "
                        "(reference train.py:140,159-165 id_ parameter; "
                        "the shipped cross_val_keys_finetune.npy used "
                        "'_finetune')")
    add_platform_flag(p)
    return p


def build_store(args, cfg):
    from contrastiveprosthetics_tpu.data.store import DeviceStore
    from contrastiveprosthetics_tpu.data.synthetic import make_processed_dataset

    if args.synthetic:
        emg, pos, glove = make_processed_dataset(cfg)
        return DeviceStore(cfg, emg, pos, glove)
    return DeviceStore.load(cfg, args.data_dir)


def main(argv=None):
    args = build_parser().parse_args(argv)
    select_platform(args.platform)

    from contrastiveprosthetics_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG, compat_config
    from contrastiveprosthetics_tpu.train.checkpoint import load_checkpoint
    from contrastiveprosthetics_tpu.train.crossval import (
        best_config,
        cross_validate,
        hyper_from_key,
        keys_array,
        load_crossval,
        sample_hyperparams,
    )
    from contrastiveprosthetics_tpu.train.engine import Trainer
    from contrastiveprosthetics_tpu.train.loop import run_test, train_loop

    cfg = compat_config(DEFAULT_CONFIG) if args.compat else DEFAULT_CONFIG

    if args.profile:
        jax.profiler.start_trace("/tmp/cptpu_trace")

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
        use_pallas_loss=True if args.pallas_loss else None,  # None → auto
        use_fused_encoder=True if args.fused_encoder else None,
        use_fused_train={"auto": None, "on": True, "off": False}[
            args.fused_train
        ],
        compute_dtype="bfloat16" if args.bf16 else "float32",
    )
    print("Dataset loaded")
    # threefry keeps the legacy raw uint32 key (byte-identical streams to
    # every prior run); hardware-RNG impls need the typed-key carrier
    from contrastiveprosthetics_tpu.utils.platform import default_prng_impl

    prng_impl = (default_prng_impl() if args.prng_impl == "auto"
                 else args.prng_impl)
    key = (jax.random.key(args.seed, impl=prng_impl)
           if prng_impl != "threefry2x32"
           else jax.random.PRNGKey(args.seed))

    # ---- cross-validation (train.py:140-198) ----
    crossval_load = args.crossval_load
    if crossval_load and not os.path.exists(
        os.path.join(args.data_dir, f"cross_val_values{args.crossval_id}.npy")
    ):
        # clean-machine path: go.sh passes --crossval_load unconditionally
        # (the reference would crash here); fall back to running the sweep
        print("no cached crossval found — running the sweep")
        crossval_load = False
    if crossval_load:
        values, keys = load_crossval(args.data_dir, id_=args.crossval_id)
    elif args.crossval_size < 1:
        # skip the hyperparameter search entirely — the reference's CLI
        # cannot (size-0 sampling feeds an empty argmax, train.py:195);
        # use the canonical mid-range config pinned by bench.py and
        # __graft_entry__.py, flowing through the same best-config path
        import numpy as np

        from contrastiveprosthetics_tpu.train.engine import Hyper

        print("crossval skipped (--crossval_size 0): "
              "canonical hyperparameters")
        canonical = Hyper(*[[v] for v in (1e-3, 1e-6, 0.5,
                                          1e-3, 1e-6, 0.3)])
        keys = keys_array(canonical, trainer.d_e)
        values = np.zeros((1, 2))
    else:
        mesh = None
        if args.spmd_crossval and len(jax.devices()) > 1:
            from contrastiveprosthetics_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(n_dp=len(jax.devices()), n_mp=1)
            print(f"crossval sharded over {mesh}")
        hypers = sample_hyperparams(args.crossval_size, seed=args.seed)
        t0 = time.time()
        values = cross_validate(
            trainer,
            hypers,
            epochs=args.crossval_epochs,
            key=jax.random.fold_in(key, 1),
            chunk=args.crossval_chunk,
            save_dir=args.data_dir,
            id_=args.crossval_id,
            mesh=mesh,
        )
        print(f"crossval: {args.crossval_size} configs in {time.time() - t0:.1f}s")
        keys = keys_array(hypers, trainer.d_e)

    best_key = best_config(values, keys)
    print(f"Best combination: {best_key}")
    d_e, hyper = hyper_from_key(best_key)
    if args.load_model:
        hyper = hyper._replace(
            lr_emg=hyper.lr_emg / 10, lr_glove=hyper.lr_glove / 10
        )

    # ---- final training (train.py:202-216) ----
    ckpt_path = os.path.join(args.checkpoint_dir, "contrastive.msgpack")
    init_state = None
    if args.load_model and os.path.exists(ckpt_path):
        print("Loading model")
        init_state = load_checkpoint(
            ckpt_path, trainer.init_state(jax.random.fold_in(key, 2))
        )
    res = train_loop(
        trainer,
        hyper,
        epochs=args.final_epochs,
        key=jax.random.fold_in(key, 3),
        annealing=True,
        checkpoint=args.no_checkpoint,
        checkpoint_path=ckpt_path,
        init_state=init_state,
        verbose=args.no_verbose,
    )
    print("Final validation model statistics")
    print(f"val loss {res.val_loss:.4f}  val acc {res.val_acc:.6f}")

    state = res.state
    if args.no_checkpoint and os.path.exists(ckpt_path):
        state = load_checkpoint(
            ckpt_path, trainer.init_state(jax.random.fold_in(key, 4))
        )

    if args.test:
        t = run_test(trainer, state, hyper, jax.random.fold_in(key, 5))
        print("loss,\t\t\tcorrect")
        print((float(t.loss), float(t.accuracy)))
        if args.results_dir:
            from contrastiveprosthetics_tpu.results.export import export_results

            export_results(t, args.results_dir, n_classes=cfg.max_tasks)
            print(f"artifacts exported to {args.results_dir}")
        if args.per_subject_eval:
            ps = trainer.evaluate_per_subject(
                state, jax.random.fold_in(key, 6), hyper, split="test"
            )
            people = cfg.people_mask(db2=args.db2)
            import numpy as np

            acc = np.asarray(ps.curve)[:, -1].reshape(len(people), -1)
            acc = acc.mean(axis=1)
            print("per-subject test accuracy (own-batch AdaBN statistics):")
            for pid, a in zip(people, acc):
                print(f"  subject {int(pid)}: {a:.4f}")
            print(f"  mean: {acc.mean():.4f}  (pooled: {float(t.accuracy):.4f})")
            if args.results_dir:
                from contrastiveprosthetics_tpu.results.export import (
                    export_per_subject,
                )

                export_per_subject(ps, args.results_dir, people)

    if args.profile:
        jax.profiler.stop_trace()
        print("profile trace written to /tmp/cptpu_trace")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
