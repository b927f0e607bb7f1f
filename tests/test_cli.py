"""CLI parse + preset-override resolution (cli.build_parser/_resolve) —
pure parsing, no jax/device work."""

import pytest

from ann3depth_tpu import cli


def _resolve(argv):
    return cli._resolve(cli.build_parser().parse_args(argv))


def test_train_overrides_resolve_onto_preset():
    cfg = _resolve(["train", "--config", "make3d-encdec", "--steps", "7",
                    "--batch-size", "3", "--datasets", "synthetic", "nyu",
                    "--ckpt-dir", "/tmp/x", "--augment", "--resume"])
    assert cfg.train.steps == 7 and cfg.train.batch_size == 3
    assert cfg.data.datasets == ("synthetic", "nyu")
    assert cfg.train.ckpt_dir == "/tmp/x"
    assert cfg.data.augment and cfg.train.resume
    # untouched preset fields survive
    assert cfg.model.name == "encdec"


def test_quant_flag_resolves_to_model_config():
    cfg = _resolve(["eval", "--config", "make3d-encdec", "--quant", "int8"])
    assert cfg.model.quant == "int8"
    # default is none
    assert _resolve(["eval", "--config", "make3d-encdec"]).model.quant == "none"


def test_model_override_and_preprocess_impl():
    cfg = _resolve(["train", "--config", "smoke", "--model", "encdec",
                    "--preprocess-impl", "pallas"])
    assert cfg.model.name == "encdec"
    assert cfg.data.preprocess_impl == "pallas"


def test_num_workers_implies_grain():
    cfg = _resolve(["train", "--config", "smoke", "--num-workers", "2"])
    assert cfg.data.use_grain and cfg.data.num_workers == 2


def test_bench_serving_flag_parses():
    args = cli.build_parser().parse_args(["bench", "--serving",
                                          "--batch-size", "64"])
    assert args.serving and args.batch_size == 64


def test_unknown_preset_and_bad_quant_rejected():
    with pytest.raises(SystemExit):
        cli.build_parser().parse_args(["train", "--config", "bogus"])
    with pytest.raises(SystemExit):
        cli.build_parser().parse_args(["train", "--quant", "int4"])


def test_cli_help_renders_and_docs_fresh():
    """Every subcommand's help must render (argparse raises on malformed
    help strings — e.g. an unescaped %% — only at render time), and
    docs/cli.md must match the current flags (regenerate with
    tools/gen_cli_docs.py)."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "gen_cli_docs", os.path.join(root, "tools", "gen_cli_docs.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    want = mod.generate()
    with open(os.path.join(root, "docs", "cli.md")) as f:
        have = f.read()
    assert have == want, ("docs/cli.md is stale — run "
                          "`python tools/gen_cli_docs.py`")


def test_cli_info_reports_model_facts(capsys):
    import json

    import numpy as np

    rc = cli.main(["info", "--config", "smoke"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["model"] == "small" and info["params"] > 0
    assert info["input_hw"] == [240, 320]
    assert len(info["output_hw"]) == 2
    assert "encdec" in info["registry"] and "dpt" in info["registry"]
    # params_mib is rounded to 2 decimals in the output
    assert np.isclose(info["params_mib_f32"],
                      info["params"] * 4 / 2**20, atol=0.01)


def test_infer_requires_image_or_video():
    # --image is no longer argparse-required (exactly one of --image /
    # --video, enforced in main so the error names both options).
    cli.build_parser().parse_args(["infer"])
    with pytest.raises(SystemExit, match="exactly one"):
        cli.main(["infer", "--config", "smoke"])


def test_synth_protocol_flags_resolve():
    """--synth-n/--synth-hw/--synth-depth-hw (r5): the CLI can reproduce
    the benchmarks' convergence protocol geometry exactly."""
    cfg = _resolve(["train", "--config", "encdec-w2-best",
                    "--datasets", "synthetic", "--synth-n", "512",
                    "--synth-hw", "360", "480",
                    "--synth-depth-hw", "180", "240"])
    assert cfg.data.datasets == ("synthetic",)
    assert cfg.data.synth_n == 512 and cfg.data.synth_test_n == 64
    assert cfg.data.synth_img_hw == (360, 480)
    assert cfg.data.synth_depth_hw == (180, 240)

    from ann3depth_tpu.train import loop as looplib
    tr = looplib.build_dataset(cfg, "train")
    te = looplib.build_dataset(cfg, "test")
    assert len(tr) == 512 and len(te) == 64
    assert tr[0][0].shape == (360, 480, 3) and tr[0][1].shape == (180, 240)
    assert tr.seed == 0 and te.seed == 1


def test_no_augment_disables_preset_default():
    """--no-augment (r5): ablation arms can turn a preset's augmentation
    off; bare --augment still turns it on; absent leaves the preset."""
    assert _resolve(["train", "--config", "nyu-encdec-aug"]).data.augment
    assert not _resolve(["train", "--config", "nyu-encdec-aug",
                         "--no-augment"]).data.augment
    assert _resolve(["train", "--config", "make3d-encdec",
                     "--augment"]).data.augment
