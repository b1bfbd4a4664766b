"""Ingest CLI — parity with the reference's ``load.py`` entry point
(``load.py:300-323``): ``--load`` builds the EMG tensor, ``--load_glove``
the glove corpus, ``--info`` prints split geometry, ``--viz`` renders one
(person, task, rep) signal. Additive: ``--root`` (raw .mat tree),
``--data_dir`` (artifact output), ``--people`` (partial ingest),
``--backend`` (jax|scipy), ``--synthetic_fixture`` (write a fabricated .mat
tree first, for smoke tests without the 10 GB corpus).
"""
from __future__ import annotations

import argparse

from contrastiveprosthetics_tpu.utils.platform import (
    add_platform_flag,
    select_platform,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Loading ninapro dataset")
    # reference flags (load.py:300-312)
    p.add_argument("--task", type=int, default=0)
    p.add_argument("--rep", type=int, default=0)
    p.add_argument("--person", type=int, default=0)
    p.add_argument("--load", action="store_true")
    p.add_argument("--load_glove", action="store_true")
    p.add_argument("--viz", action="store_true")
    p.add_argument("--info", action="store_true")
    p.add_argument("--complete", action="store_true")
    p.add_argument("--no_glove", action="store_true")
    # additive
    p.add_argument("--root", type=str, default=".")
    p.add_argument("--data_dir", type=str, default="data")
    p.add_argument("--people", type=int, nargs="*", default=None,
                   help="canonical person positions to ingest (default all)")
    p.add_argument("--backend", choices=["jax", "scipy"], default="jax")
    p.add_argument("--synthetic_fixture", action="store_true")
    p.add_argument("--compat", action="store_true",
                   help="reproduce every reference quirk (uint8 time mask, "
                        "complete stats, shared StepLR, 249-col voting)")
    p.add_argument("--check_glove", action="store_true",
                   help="sanity-check the glove-angle corpus: stimulus "
                        "ranges + NaN scan per subject (reference "
                        "get_calibration.py)")
    add_platform_flag(p)
    return p


def check_glove_corpus(cfg, root, people=None):
    """Reference ``get_calibration.py:1-20``: per subject, print restimulus
    ranges and NaN presence in the angle recordings."""
    import numpy as np
    import scipy.io as sio

    people = people if people is not None else range(
        cfg.glove_people_start, cfg.glove_people_stop
    )
    issues = 0
    for person in people:
        p_dir = str(person + 1)
        for ex in ("1", "2"):
            path = f"{root}/s_{p_dir}_angles/S{p_dir}_E{ex}_A1.mat"
            try:
                m = sio.loadmat(path)
            except FileNotFoundError:
                print(f"s{p_dir} E{ex}: MISSING")
                issues += 1
                continue
            ang = m["angles"]
            stim = m["restimulus"]
            nan_cols = np.where(np.isnan(ang).any(axis=0))[0]
            print(
                f"s{p_dir} E{ex}: stim [{stim.min()}, {stim.max()}] "
                f"angles {ang.shape} nan_cols={nan_cols.tolist() or 'none'}"
            )
            if len(nan_cols):
                issues += 1
    print(f"glove corpus check: {issues} issue(s)")
    return issues


def main(argv=None):
    args = build_parser().parse_args(argv)
    select_platform(args.platform)
    from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG, compat_config
    from contrastiveprosthetics_tpu.data.ingest import ingest_emg, ingest_glove

    cfg = compat_config(DEFAULT_CONFIG) if args.compat else DEFAULT_CONFIG

    if args.synthetic_fixture:
        from contrastiveprosthetics_tpu.data.synthetic import (
            write_emg_mat_files,
            write_glove_mat_files,
        )

        positions = args.people if args.people is not None else list(range(2))
        print(f"writing synthetic .mat fixture to {args.root}")
        write_emg_mat_files(args.root, cfg, positions)
        write_glove_mat_files(args.root, cfg, people=[28, 29])

    if args.check_glove:
        glove_people = [28, 29] if args.synthetic_fixture else None
        check_glove_corpus(cfg, args.root, people=glove_people)

    # a synthetic fixture only writes glove subjects 28-29; scope every
    # glove ingest accordingly (a full 39-person ingest would crash on
    # the missing subjects)
    glove_people = [28, 29] if args.synthetic_fixture else None
    if args.load:
        ingest_emg(
            cfg,
            args.root,
            args.data_dir,
            people_positions=args.people,
            complete=args.complete or cfg.compat_complete_stats,
            backend=args.backend,
        )
        if not args.no_glove and not args.load_glove:
            ingest_glove(cfg, args.root, args.data_dir, people=glove_people)
    if args.load_glove:
        ingest_glove(cfg, args.root, args.data_dir, people=glove_people)

    if args.info or args.viz:
        from contrastiveprosthetics_tpu.data.store import DeviceStore

        store = DeviceStore.load(cfg, args.data_dir)
        if args.info:
            import numpy as np

            print("Tasks (shuffled order):", cfg.tasks())
            for split in ("train", "val", "test"):
                v = store.view(split)
                t = np.asarray(v.emg_flat)
                print(
                    f"{split.upper()}: tasks={v.n_tasks} people={v.n_people} "
                    f"reps={v.n_reps} D={v.D} total={v.n_tasks * v.D}"
                )
                # per-split tensor ranges (reference info(), load.py:278-291)
                print(
                    f"\trange [{t.min():.6g}, {t.max():.6g}] "
                    f"mean {t.mean():.6g} std {t.std():.6g}"
                )
        if args.viz:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            import numpy as np

            dat = np.asarray(store.emg[args.task, args.person, args.rep])
            for sensor in range(cfg.emg_dim):
                plt.plot(dat[:, sensor])
            out = "viz_person%d_task%d_rep%d.png" % (
                args.person, args.task, args.rep,
            )
            plt.savefig(out, dpi=110)
            print(f"saved {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
