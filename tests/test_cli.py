"""User-facing CLI surfaces added in round 2: cptpu-serve and the
per-subject eval exporter (VERDICT r1 #5 — advertised capabilities must be
reachable from a CLI, not only as library calls)."""
import xml.etree.ElementTree as ET
import zipfile

import numpy as np
import pytest

from contrastiveprosthetics_tpu.config import DEFAULT_CONFIG

CFG = DEFAULT_CONFIG


def test_serve_cli_demo_single_session(tmp_path, capsys):
    from contrastiveprosthetics_tpu.cli.serve import main

    out = tmp_path / "preds.npz"
    rc = main([
        "--demo", "--seconds", "0.25", "--subset", "3,7,12",
        "--out", str(out),
    ])
    assert rc == 0
    text = capsys.readouterr().out
    assert "ms/tick" in text
    with np.load(out) as z:
        preds, votes = z["preds"], z["votes"]
    n_blocks = int(0.25 * CFG.hz) // CFG.factor
    assert preds.shape == (1, n_blocks)
    # subset restriction: every per-frame pred and vote inside {3,7,12}
    assert set(np.unique(preds)) <= {3, 7, 12}
    assert set(np.unique(votes)) <= {3, 7, 12}


def test_serve_cli_recording_file_and_sessions(tmp_path, capsys):
    from contrastiveprosthetics_tpu.cli.serve import main

    rng = np.random.default_rng(1)
    rec = rng.standard_normal((2, 10 * CFG.factor, CFG.emg_dim)).astype(
        np.float32
    )
    rec_path = tmp_path / "rec.npy"
    np.save(rec_path, rec)
    out = tmp_path / "preds.npz"
    rc = main([
        "--recording", str(rec_path), "--sessions", "2",
        "--out", str(out), "--quiet",
    ])
    assert rc == 0
    with np.load(out) as z:
        assert z["preds"].shape == (2, 10)
        assert z["votes"].shape == (2, 10)


def test_serve_cli_replay_matches_tick_loop(tmp_path, capsys):
    """--replay (one-dispatch scan chain) must produce byte-identical
    preds/votes to the per-tick simulation, single and multi-session."""
    from contrastiveprosthetics_tpu.cli.serve import main

    rng = np.random.default_rng(2)
    rec = rng.standard_normal((2, 8 * CFG.factor, CFG.emg_dim)).astype(
        np.float32
    )
    rec_path = tmp_path / "rec.npy"
    np.save(rec_path, rec)
    outs = {}
    for mode, extra in (("tick", []), ("replay", ["--replay"])):
        for s, sel in (("1", rec[:1]), ("2", rec)):
            np.save(rec_path, sel if s == "2" else sel[0])
            out = tmp_path / f"{mode}_{s}.npz"
            rc = main([
                "--recording", str(rec_path), "--sessions", s,
                "--out", str(out), "--quiet", *extra,
            ])
            assert rc == 0
            with np.load(out) as z:
                outs[(mode, s)] = (z["preds"].copy(), z["votes"].copy())
    capsys.readouterr()
    for s in ("1", "2"):
        np.testing.assert_array_equal(outs[("tick", s)][0],
                                      outs[("replay", s)][0])
        np.testing.assert_array_equal(outs[("tick", s)][1],
                                      outs[("replay", s)][1])


def test_serve_cli_session_count_mismatch(tmp_path):
    from contrastiveprosthetics_tpu.cli.serve import main

    rec = np.zeros((3, 2 * CFG.factor, CFG.emg_dim), np.float32)
    p = tmp_path / "rec.npy"
    np.save(p, rec)
    with pytest.raises(SystemExit):
        main(["--recording", str(p), "--sessions", "2"])


def test_export_per_subject_artifacts(tmp_path):
    """per_subject_acc.{npy,xlsx}: one row per subject in people_mask
    order, values = mean of that subject's final-window accuracies."""
    from contrastiveprosthetics_tpu.results.export import export_per_subject

    def read_xlsx_floats(path):
        z = zipfile.ZipFile(path)
        ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        return [
            [float(v.text) for v in row.findall(".//m:v", ns)]
            for row in root.findall(".//m:row", ns)
        ]

    class FakeResult:
        pass

    n_people, per_subject, n_prefix = 3, 4, 24
    rng = np.random.default_rng(0)
    curve = rng.uniform(size=(n_people * per_subject, n_prefix))
    res = FakeResult()
    res.curve = curve
    people = np.array([43, 40, 45])
    out = export_per_subject(res, str(tmp_path), people)

    want = curve[:, -1].reshape(n_people, per_subject).mean(axis=1)
    np.testing.assert_allclose(out["per_subject_acc"], want)
    got = np.load(tmp_path / "per_subject_acc.npy")
    np.testing.assert_allclose(got, want)
    rows = read_xlsx_floats(str(tmp_path / "per_subject_acc.xlsx"))
    np.testing.assert_allclose(
        np.asarray(rows), np.stack([people.astype(float), want], axis=1)
    )


def test_train_cli_exposes_per_subject_flag():
    from contrastiveprosthetics_tpu.cli.train import build_parser

    args = build_parser().parse_args(["--per_subject_eval"])
    assert args.per_subject_eval is True
    assert build_parser().parse_args([]).per_subject_eval is False


def test_platform_flag_on_every_cli(monkeypatch):
    """--platform is on all four entry points; env var is the fallback.

    select_platform must resolve flag > CPTPU_PLATFORM > auto, reject
    unknown names, and actually pin the backend (the suite already runs
    CPU-forced, so "cpu" must agree with the live default_backend).
    """
    import jax

    from contrastiveprosthetics_tpu.cli import load as cli_load
    from contrastiveprosthetics_tpu.cli import serve as cli_serve
    from contrastiveprosthetics_tpu.cli import train as cli_train
    from contrastiveprosthetics_tpu.utils.platform import select_platform

    for mod, extra in ((cli_train, []), (cli_load, []),
                       (cli_serve, ["--demo"])):
        args = mod.build_parser().parse_args(extra + ["--platform", "cpu"])
        assert args.platform == "cpu"
        assert mod.build_parser().parse_args(extra).platform is None

    monkeypatch.delenv("CPTPU_PLATFORM", raising=False)
    assert select_platform(None) == "auto"
    assert select_platform("cpu") == "cpu"
    monkeypatch.setenv("CPTPU_PLATFORM", "cpu")
    assert select_platform(None) == "cpu"
    assert jax.default_backend() == "cpu"
    with pytest.raises(ValueError):
        select_platform("gpu")


def test_serve_cli_exposes_fused_encoder_flag():
    from contrastiveprosthetics_tpu.cli.serve import build_parser

    args = build_parser().parse_args(["--demo", "--fused_encoder"])
    assert args.fused_encoder is True
    assert build_parser().parse_args(["--demo"]).fused_encoder is False


def test_serve_cli_no_fused_encoder_is_the_escape_hatch(tmp_path):
    """The tri-state: absent → auto, --fused_encoder → forced ON,
    --no_fused_encoder → forced OFF (the operator escape hatch when a
    deployment geometry hits a Mosaic/VMEM issue the auto gate's estimate
    misses); combining both is an error."""
    from contrastiveprosthetics_tpu.cli.serve import build_parser, main

    assert build_parser().parse_args(
        ["--demo", "--no_fused_encoder"]
    ).no_fused_encoder is True
    assert build_parser().parse_args(["--demo"]).no_fused_encoder is False
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["--demo", "--fused_encoder", "--no_fused_encoder",
              "--out", str(tmp_path / "o.npz")])
    # forced-OFF demo runs end to end on the XLA path
    main(["--demo", "--no_fused_encoder", "--quiet",
          "--out", str(tmp_path / "off.npz")])


def test_train_cli_exposes_fused_encoder_flag():
    from contrastiveprosthetics_tpu.cli.train import build_parser

    assert build_parser().parse_args(["--fused_encoder"]).fused_encoder
    assert not build_parser().parse_args([]).fused_encoder


def test_train_cli_exposes_prng_impl_flag():
    from contrastiveprosthetics_tpu.cli.train import build_parser

    assert build_parser().parse_args([]).prng_impl == "auto"
    assert build_parser().parse_args(
        ["--prng_impl", "rbg"]
    ).prng_impl == "rbg"
    assert build_parser().parse_args(
        ["--prng_impl", "threefry2x32"]
    ).prng_impl == "threefry2x32"
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--prng_impl", "nonsense"])


def test_default_prng_impl_resolves_per_backend():
    """auto → the hardware RNG only on TPU; threefry on this CPU backend
    (streams byte-identical to the pre-flip default — the rationale and
    the v5e A/B numbers live in the resolver's docstring)."""
    from contrastiveprosthetics_tpu.utils.platform import default_prng_impl

    import jax

    impl = default_prng_impl()
    expected = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    assert impl == expected
    # the resolved impl must construct a working typed/raw key
    key = (jax.random.key(0, impl=impl) if impl != "threefry2x32"
           else jax.random.PRNGKey(0))
    jax.random.uniform(jax.random.fold_in(key, 1), (2,))


@pytest.mark.slow
def test_serve_cli_fused_replay_matches_xla_replay(tmp_path):
    """--fused_encoder --replay (the one-kernel tick chain, interpret mode
    on CPU) must byte-match the XLA replay on the seeded --demo workload
    (full-width model)."""
    from contrastiveprosthetics_tpu.cli.serve import main

    out_x = tmp_path / "x.npz"
    out_f = tmp_path / "f.npz"
    args = ["--demo", "--seconds", "0.12", "--replay", "--subset", "1,5,9",
            "--quiet"]
    assert main(args + ["--out", str(out_x)]) == 0
    assert main(args + ["--out", str(out_f), "--fused_encoder"]) == 0
    with np.load(out_x) as zx, np.load(out_f) as zf:
        np.testing.assert_array_equal(zf["preds"], zx["preds"])
        np.testing.assert_array_equal(zf["votes"], zx["votes"])


@pytest.mark.slow
def test_serve_cli_batched_fused_replay_matches_xla_replay(tmp_path):
    """--sessions 2 --fused_encoder --replay (the batched §4 kernel,
    interpret mode on CPU) must byte-match the vmapped XLA replay on the
    seeded --demo workload (full-width model)."""
    from contrastiveprosthetics_tpu.cli.serve import main

    out_x = tmp_path / "x.npz"
    out_f = tmp_path / "f.npz"
    args = ["--demo", "--seconds", "0.12", "--sessions", "2", "--replay",
            "--subset", "1,5,9", "--quiet"]
    assert main(args + ["--out", str(out_x)]) == 0
    assert main(args + ["--out", str(out_f), "--fused_encoder"]) == 0
    with np.load(out_x) as zx, np.load(out_f) as zf:
        np.testing.assert_array_equal(zf["preds"], zx["preds"])
        np.testing.assert_array_equal(zf["votes"], zx["votes"])


def test_serve_cli_bf16_demo(tmp_path):
    """--bf16 runs the tick in bfloat16 compute; outputs stay valid ints
    within the subset."""
    from contrastiveprosthetics_tpu.cli.serve import main

    out = tmp_path / "p.npz"
    rc = main(["--demo", "--seconds", "0.1", "--bf16", "--replay",
               "--subset", "2,4", "--quiet", "--out", str(out)])
    assert rc == 0
    with np.load(out) as z:
        assert set(np.unique(z["preds"])) <= {2, 4}
        assert set(np.unique(z["votes"])) <= {2, 4}
