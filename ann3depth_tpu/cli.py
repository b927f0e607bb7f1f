"""CLI entrypoint preserving the reference's surface (SURVEY.md §1 L6, [B:5]):

    python -m ann3depth_tpu train --config make3d-encdec --steps 1000 ...
    python -m ann3depth_tpu eval  --config make3d-encdec --ckpt-dir ...
    python -m ann3depth_tpu live  --ckpt-dir ... [--camera 0 | --video f]
    python -m ann3depth_tpu download --dataset make3d --data-dir data
    python -m ann3depth_tpu bench --config make3d-encdec
    python -m ann3depth_tpu export --ckpt-dir ... --out-dir artifact/

Subcommands mirror the reference's modes (train / eval / live view +
dataset download); flags resolve onto the typed presets in config.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import sys

from ann3depth_tpu import config as cfglib


def _window_epochs(v: str) -> int:
    """--window-epochs value: an int, or 'auto' (-> 0, the config
    sentinel for measured calibration — train/loop.py)."""
    if v == "auto":
        return 0
    return int(v)


def _common_flags(p):
    p.add_argument("--config", default="make3d-encdec",
                   choices=sorted(cfglib.PRESETS), help="named preset [B:6-12]")
    p.add_argument("--model", help="override model name (registry key)")
    p.add_argument("--width-mult", type=float,
                   help="channel-width multiplier for the conv models "
                        "(capacity dial; priced in BASELINE.md — width 2 "
                        "buys -4.2%% RMSE at 1.73x step time on the "
                        "synthetic protocol)")
    p.add_argument("--datasets", nargs="+", help="override dataset list")
    p.add_argument("--data-dir", help="dataset root directory")
    p.add_argument("--ckpt-dir", help="checkpoint directory")
    p.add_argument("--batch-size", type=int)
    p.add_argument("--grad-accum", type=int,
                   help="microbatches per optimizer update (one jitted "
                        "scan; peak memory = batch_size/grad_accum images)")
    p.add_argument("--tp", type=int, dest="tensor_parallel",
                   help="tensor-parallel width: mesh gains a 'model' axis "
                        "of this size and the DPT transformer's heads/MLP "
                        "shard over it (dp = n_devices/tp)")
    p.add_argument("--zero1", action="store_true",
                   help="shard optimizer state over the data axis (ZeRO-1: "
                        "reduce-scattered grads, 1/N Adam state per device, "
                        "all-gathered params)")
    p.add_argument("--ema-decay", type=float,
                   help="maintain an EMA of params in the train step "
                        "(e.g. 0.999); eval --ema scores it")
    p.add_argument("--steps", type=int)
    p.add_argument("--learning-rate", type=float)
    p.add_argument("--loss", choices=["si", "si+grad", "l2", "berhu"],
                   help="training loss: scale-invariant log (default), "
                        "si plus the Eigen & Fergus 2015 log-gradient "
                        "matching term (depth-structure supervision), "
                        "linear-depth MSE, or reverse Huber")
    p.add_argument("--schedule", choices=["cosine", "constant"],
                   help="lr schedule: warmup+cosine decay (default) or a "
                        "flat lr after warmup (the reference regime)")
    p.add_argument("--optimizer", choices=["adamw", "adam", "sgd"],
                   help="update rule (default adamw; for sgd, --adam-b1 "
                        "doubles as the momentum coefficient)")
    p.add_argument("--warmup-steps", type=int,
                   help="linear warmup steps before the cosine decay")
    p.add_argument("--weight-decay", type=float,
                   help="AdamW decoupled weight decay (default 0)")
    p.add_argument("--clip-norm", type=float,
                   help="global-norm gradient clip (default 1.0; <= 0 "
                        "disables clipping)")
    p.add_argument("--adam-b1", type=float)
    p.add_argument("--adam-b2", type=float)
    p.add_argument("--seed", type=int)
    p.add_argument("--preprocess-impl", choices=["xla", "pallas"],
                   help="device preprocess implementation (see DataConfig)")
    p.add_argument("--use-grain", action="store_true",
                   help="grain-backed host input pipeline (worker-parallel "
                        "decode; see DataConfig.use_grain)")
    p.add_argument("--num-workers", type=int,
                   help="grain worker processes (implies --use-grain)")
    p.add_argument("--cache-device", action="store_true",
                   help="stage the whole dataset into device HBM once and "
                        "gather batches on device (uniform-shape datasets "
                        "within the HBM budget; see DataConfig)")
    p.add_argument("--cache-window-mb", type=int, metavar="MB",
                   help="with --cache-device: rotate fixed-size HBM "
                        "windows instead of staging the whole dataset — "
                        "datasets larger than the budget train at device "
                        "rate; two windows stay resident (active + "
                        "background-staged next)")
    p.add_argument("--window-epochs", type=_window_epochs, metavar="E",
                   help="data echoing: train E passes over each resident "
                        "window before rotating (divides host-link "
                        "bandwidth demand by E; needs --cache-window-mb). "
                        "'auto' calibrates E from one measured window "
                        "staging + one training pass (logged; pin the "
                        "printed value for reproducible resumes)")
    p.add_argument("--synth-n", type=int, metavar="N",
                   help="synthetic dataset: train-split example count "
                        "(default 64; the benchmarks' convergence "
                        "protocol uses 512)")
    p.add_argument("--synth-test-n", type=int, metavar="N",
                   help="synthetic dataset: test-split example count "
                        "(default 64)")
    p.add_argument("--synth-hw", type=int, nargs=2, metavar=("H", "W"),
                   help="synthetic dataset: raw RGB shape (default 96 "
                        "128; the convergence protocol uses 360 480)")
    p.add_argument("--synth-depth-hw", type=int, nargs=2,
                   metavar=("H", "W"),
                   help="synthetic dataset: raw depth-grid shape "
                        "(default 48 64; the protocol uses 180 240)")
    p.add_argument("--ckpt-step", type=int, metavar="N",
                   help="use the checkpoint saved at step N instead of "
                        "the latest (eval/infer/live/export/serve; "
                        "train wants --resume-step)")
    p.add_argument("--quant", choices=["none", "int8", "int8-qat"],
                   help="int8 MXU convs: 'int8' serves a bf16-trained "
                        "checkpoint quantized (eval/live/infer — rejected "
                        "for train); 'int8-qat' trains the fake-quant "
                        "simulation (STE) so the checkpoint serves int8 "
                        "at ~zero divergence")


def _resolve(args) -> cfglib.Config:
    cfg = cfglib.get_config(args.config)
    data, model, train = {}, {}, {}
    if args.model: model["name"] = args.model
    if getattr(args, "width_mult", None) is not None:
        model["width_mult"] = args.width_mult
    if args.datasets: data["datasets"] = tuple(args.datasets)
    if args.data_dir: data["data_dir"] = args.data_dir
    if args.ckpt_dir: train["ckpt_dir"] = args.ckpt_dir
    if args.batch_size is not None: train["batch_size"] = args.batch_size
    if getattr(args, "grad_accum", None) is not None:
        train["grad_accum"] = args.grad_accum
    if getattr(args, "zero1", False): train["zero1"] = True
    if getattr(args, "steps_per_dispatch", None) is not None:
        train["steps_per_dispatch"] = args.steps_per_dispatch
    if getattr(args, "tensor_parallel", None) is not None:
        train["tensor_parallel"] = args.tensor_parallel
    if getattr(args, "ema_decay", None) is not None:
        train["ema_decay"] = args.ema_decay
    if getattr(args, "resume_step", None) is not None:
        train["resume_step"] = args.resume_step
    if getattr(args, "early_stop_patience", None) is not None:
        train["early_stop_patience"] = args.early_stop_patience
    if getattr(args, "early_stop_min_delta", None) is not None:
        train["early_stop_min_delta"] = args.early_stop_min_delta
    if getattr(args, "eval_every", None) is not None:
        train["eval_every"] = args.eval_every
    if getattr(args, "log_every", None) is not None:
        train["log_every"] = args.log_every
    if getattr(args, "checkpoint_every", None) is not None:
        train["checkpoint_every"] = args.checkpoint_every
    if getattr(args, "save_best", False):
        train["save_best"] = True
    if args.steps is not None: train["steps"] = args.steps
    if args.learning_rate is not None:
        train["learning_rate"] = args.learning_rate
    if getattr(args, "loss", None):
        train["loss"] = args.loss
    if getattr(args, "optimizer", None):
        train["optimizer"] = args.optimizer
    if getattr(args, "schedule", None):
        train["schedule"] = args.schedule
    if getattr(args, "warmup_steps", None) is not None:
        train["warmup_steps"] = args.warmup_steps
    if getattr(args, "weight_decay", None) is not None:
        train["weight_decay"] = args.weight_decay
    if getattr(args, "clip_norm", None) is not None:
        train["clip_norm"] = args.clip_norm
    if getattr(args, "adam_b1", None) is not None:
        train["adam_b1"] = args.adam_b1
    if getattr(args, "adam_b2", None) is not None:
        train["adam_b2"] = args.adam_b2
    if args.seed is not None: train["seed"] = args.seed
    if getattr(args, "preprocess_impl", None): data["preprocess_impl"] = args.preprocess_impl
    if getattr(args, "quant", None): model["quant"] = args.quant
    if getattr(args, "use_grain", False): data["use_grain"] = True
    if getattr(args, "cache_device", False): data["cache_device"] = True
    if getattr(args, "cache_window_mb", None) is not None:
        data["cache_window_mb"] = args.cache_window_mb
    if getattr(args, "window_epochs", None) is not None:
        data["window_epochs"] = args.window_epochs
    if getattr(args, "synth_n", None) is not None:
        data["synth_n"] = args.synth_n
    if getattr(args, "synth_test_n", None) is not None:
        data["synth_test_n"] = args.synth_test_n
    if getattr(args, "synth_hw", None) is not None:
        data["synth_img_hw"] = tuple(args.synth_hw)
    if getattr(args, "synth_depth_hw", None) is not None:
        data["synth_depth_hw"] = tuple(args.synth_depth_hw)
    if getattr(args, "num_workers", None):
        data["use_grain"] = True
        data["num_workers"] = args.num_workers
    if (not getattr(args, "distill_from", None)
            and any(getattr(args, k, None) is not None
                    for k in ("distill_model", "distill_width_mult",
                              "distill_alpha"))):
        raise SystemExit(
            "--distill-model/--distill-width-mult/--distill-alpha "
            "configure the teacher and need --distill-from CKPT_DIR — "
            "without it the run would silently train plain")
    if getattr(args, "distill_from", None):
        train["distill_from"] = args.distill_from
    if getattr(args, "distill_model", None):
        train["distill_model"] = args.distill_model
    if getattr(args, "distill_width_mult", None) is not None:
        train["distill_width_mult"] = args.distill_width_mult
    if getattr(args, "distill_alpha", None) is not None:
        train["distill_alpha"] = args.distill_alpha
    if getattr(args, "resume", False): train["resume"] = True
    if getattr(args, "profile", None): train["profile_dir"] = args.profile
    if getattr(args, "profile_steps", None):
        train["profile_steps"] = args.profile_steps
    if getattr(args, "tensorboard", False): train["tensorboard"] = True
    if getattr(args, "augment", None) is not None:
        data["augment"] = args.augment
    live = {}
    if getattr(args, "smooth", None) is not None:
        live["smooth"] = args.smooth
    if getattr(args, "colormap", None):
        live["colormap"] = args.colormap
    if live:
        cfg = dataclasses.replace(
            cfg, live=dataclasses.replace(cfg.live, **live))
    for section, overrides in (("data", data), ("model", model), ("train", train)):
        if overrides:
            cfg = dataclasses.replace(
                cfg, **{section: dataclasses.replace(getattr(cfg, section), **overrides)})
    return cfg


def build_parser():
    p = argparse.ArgumentParser(prog="ann3depth_tpu", description=__doc__)
    sub = p.add_subparsers(dest="mode", required=True)

    pt = sub.add_parser("train", help="train a depth model")
    _common_flags(pt)
    pt.add_argument("--resume", action="store_true",
                    help="continue from latest checkpoint (the reference's --cont)")
    pt.add_argument("--resume-step", type=int, metavar="N",
                    help="resume from the checkpoint at step N instead of "
                         "the latest (rollback; implies --resume and "
                         "DELETES checkpoints newer than N)")
    pt.add_argument("--augment", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="fused flip/crop-zoom/photometric augmentation; "
                         "--no-augment disables a preset's default (e.g. "
                         "the nyu-encdec-aug ablation arm)")
    pt.add_argument("--steps-per-dispatch", type=int, metavar="K",
                    help="fold K train steps into one scanned device "
                         "program per dispatch (requires --cache-device; "
                         "steps and log/checkpoint/eval cadences must be "
                         "multiples of K). Removes the per-step dispatch "
                         "boundary — the loop then runs at the scan-of-K "
                         "benchmark rate")
    pt.add_argument("--tensorboard", action="store_true",
                    help="also write TensorBoard event files under workdir/tb")
    pt.add_argument("--eval-every", type=int,
                    help="in-loop eval cadence in steps (0 disables)")
    pt.add_argument("--log-every", type=int,
                    help="metrics/log cadence in steps (default 50; 0 "
                         "logs only the final step; must be a multiple "
                         "of --steps-per-dispatch)")
    pt.add_argument("--checkpoint-every", type=int,
                    help="checkpoint cadence in steps (default 500; 0 "
                         "saves only the final step)")
    pt.add_argument("--early-stop-patience", type=int,
                    help="stop when the in-loop eval RMSE hasn't improved "
                         "for this many consecutive evals (0 = off; "
                         "requires eval-every > 0)")
    pt.add_argument("--early-stop-min-delta", type=float,
                    help="minimum RMSE improvement that resets the "
                         "early-stop counter (default 0)")
    pt.add_argument("--save-best", action="store_true",
                    help="keep a separate best-in-loop-eval checkpoint "
                         "under <ckpt-dir>/best (one slot, overwritten on "
                         "improvement; survives crashes/resumes via "
                         "best_metric.json; requires --eval-every). "
                         "Serve/eval it with --ckpt-dir <ckpt-dir>/best")
    pt.add_argument("--distill-from", metavar="CKPT_DIR",
                    help="knowledge distillation: restore a frozen teacher "
                         "from this checkpoint dir and add --distill-alpha "
                         "x mean((student_log - teacher_log)^2) to the "
                         "loss (teacher forward fused into the same jitted "
                         "step). Train a big model once (e.g. encdec-w2), "
                         "distill into the cheap serving model")
    pt.add_argument("--distill-model",
                    help="teacher architecture (registry key; default: the "
                         "student's --model)")
    pt.add_argument("--distill-width-mult", type=float,
                    help="teacher width multiplier — must match the "
                         "checkpoint in --distill-from (default 1.0)")
    pt.add_argument("--distill-alpha", type=float,
                    help="weight of the teacher-matching term in (0, 1] "
                         "(default 0.5; 1.0 = train on the teacher alone)")
    pt.add_argument("--workdir", help="metrics/log directory (default: ckpt dir)")
    pt.add_argument("--profile", metavar="DIR",
                    help="emit a jax.profiler (TensorBoard/Perfetto) trace of "
                         "a steady-state window of train steps into DIR")
    pt.add_argument("--profile-steps", type=int,
                    help="how many hot-loop steps the trace covers "
                         "(default 20)")
    pt.add_argument("--multihost", action="store_true",
                    help="join a jax.distributed cluster with auto-detected "
                         "coordination (TPU pod metadata); one process per "
                         "host, mesh over all hosts' chips")
    pt.add_argument("--coordinator", metavar="HOST:PORT",
                    help="explicit jax.distributed coordinator (use with "
                         "--num-processes/--process-id; implies --multihost)")
    pt.add_argument("--num-processes", type=int)
    pt.add_argument("--process-id", type=int)

    pe = sub.add_parser("eval", help="evaluate RMSE etc. on the test split")
    _common_flags(pe)
    pe.add_argument("--max-batches", type=int)
    pe.add_argument("--ema", action="store_true",
                    help="score the EMA (Polyak-averaged) weights from a "
                         "checkpoint trained with --ema-decay")
    pe.add_argument("--report-dir", metavar="DIR",
                    help="also write per-image error attribution: "
                         "per_image.jsonl, a worst-K rgb|gt|pred triple "
                         "grid (worst.png), summary.json")
    pe.add_argument("--report-worst", type=int, default=8,
                    help="how many highest-RMSE images worst.png renders "
                         "(default 8)")
    pe.add_argument("--tta", choices=["flip"], default="",
                    help="test-time augmentation: average the prediction "
                         "with the mirrored-input prediction (second "
                         "forward pass; quality priced in BASELINE.md)")
    pe.add_argument("--avg-last", type=int, metavar="K",
                    help="score the uniform average of the last K retained "
                         "checkpoints (post-hoc SWA; exclusive with "
                         "--ckpt-step)")
    pe.add_argument("--align", choices=["median"], default="",
                    help="per-image scale alignment before metrics: "
                         "'median' rescales each prediction by "
                         "median(gt)/median(pred) over valid pixels (the "
                         "standard scale-ambiguous monocular-depth "
                         "protocol, Zhou et al. 2017) — reports depth "
                         "structure with global scale factored out")
    pe.add_argument("--protocols", metavar="P1,P2,...",
                    help="score several protocol variants in one run, "
                         "sharing the restored checkpoint and (with "
                         "--cache-device) ONE staged test pool: tokens "
                         "are 'plain' or '+'-joined subsets of "
                         "tta|align|crop (e.g. plain,tta,tta+align+crop);"
                         " --tta/--align/--crop supply the component "
                         "values (defaults flip/median/eigen). Prints "
                         "{token: metrics}. Exclusive with --report-dir "
                         "and multi-dataset configs")
    pe.add_argument("--crop", choices=["eigen", "garg"], default="",
                    help="literature eval crop: compute metrics only "
                         "inside the Eigen et al. 2014 / Garg et al. 2016 "
                         "fractional window of the depth map (the "
                         "crop-conditioned protocol published KITTI/NYU "
                         "numbers use; composes with --align/--tta)")

    pl = sub.add_parser("live", help="continuous depth view from camera/video")
    _common_flags(pl)
    pl.add_argument("--camera", type=int, default=0)
    pl.add_argument("--video", help="video file instead of camera")
    pl.add_argument("--no-display", action="store_true",
                    help="run headless (benchmark/latency mode)")
    pl.add_argument("--max-frames", type=int)
    pl.add_argument("--record", metavar="OUT.avi",
                    help="also append every displayed depth frame to this "
                         "video file (what the session showed, drops "
                         "included; offline files want `infer --video`)")
    pl.add_argument("--smooth", type=float,
                    help="temporal EMA coefficient in [0,1): blend each "
                         "frame's log-depth with the previous one inside "
                         "the device program (flicker suppression; 0.8 is "
                         "a good start)")
    pl.add_argument("--colormap",
                    choices=["turbo", "viridis", "magma", "gray"],
                    help="depth rendering colormap (default turbo; a "
                         "256-entry LUT gather inside the device program)")

    pi = sub.add_parser("infer", help="predict depth maps for image file(s) "
                        "or transcode a whole video offline")
    _common_flags(pi)
    pi.add_argument("--image", nargs="+",
                    help="input image file(s) (any size; resized on device)")
    pi.add_argument("--video",
                    help="transcode a video file instead: writes "
                         "<stem>_depth.<ext> with colormapped depth frames "
                         "(batched device path — throughput, not the live "
                         "viewer's latency loop)")
    pi.add_argument("--side-by-side", action="store_true",
                    help="with --video: write input|depth side by side")
    pi.add_argument("--video-batch", type=int, default=8,
                    help="device batch for --video (default 8)")
    pi.add_argument("--max-frames", type=int,
                    help="with --video: stop after N frames")
    pi.add_argument("--depth-npy", action="store_true",
                    help="with --video: also write the raw depth stack "
                         "(<stem>_depth.npy, [N, h, w] f32 meters)")
    pi.add_argument("--out-dir", default=".",
                    help="where <stem>_depth.npy and <stem>_depth.png go")
    pi.add_argument("--no-png", action="store_true",
                    help="skip the colormapped PNG, write only the .npy")
    pi.add_argument("--ply", action="store_true",
                    help="also export a 3-D point cloud (<stem>_cloud.ply: "
                         "depth back-projected through a pinhole camera, "
                         "colored from the input image)")
    pi.add_argument("--fov-deg", type=float, default=55.0,
                    help="horizontal field of view for --ply "
                         "back-projection (default 55)")
    pi.add_argument("--colormap",
                    choices=["turbo", "viridis", "magma", "gray"],
                    help="depth rendering colormap for the PNG / --video "
                         "output (default turbo)")
    pi.add_argument("--ema", action="store_true",
                    help="use the EMA weights from the checkpoint")
    pi.add_argument("--tta", choices=["flip"], default="",
                    help="average with the mirrored-input prediction "
                         "(second forward pass; works for --image and "
                         "--video)")

    pn = sub.add_parser("info", help="inspect a model/config: parameter "
                        "count, shapes, registry, optional XLA FLOPs")
    _common_flags(pn)
    pn.add_argument("--flops", action="store_true",
                    help="also compile the forward pass and report XLA's "
                         "per-image FLOP count (+ MFU peak for this chip)")

    pd = sub.add_parser("download", help="fetch + extract datasets")
    pd.add_argument("--dataset", required=True, choices=["make3d", "nyu"])
    pd.add_argument("--data-dir", default="data")
    pd.add_argument("--record-checksums", action="store_true",
                    help="after verification, write the staged archives' "
                         "sha256 into <data-dir>/<dataset>/checksums.json; "
                         "every later verify enforces them (first verified "
                         "staging becomes a hard integrity gate)")

    pp = sub.add_parser("prepare", help="pack a dataset into records "
                        "(decode once, train many times)")
    pp.add_argument("--dataset", required=True,
                    choices=["make3d", "nyu", "synthetic"])
    pp.add_argument("--data-dir", default="data")
    pp.add_argument("--out-dir", help="default: <data-dir>/records")
    pp.add_argument("--split", default="train", choices=["train", "test"])
    pp.add_argument("--format", default="npy", choices=["npy", "npz"],
                    help="npy: one memmap'd pair per split (shuffle-friendly"
                    " random access, the default); npz: legacy shards")
    pp.add_argument("--shard-size", type=int, default=64,
                    help="npz format only")

    pb = sub.add_parser("bench", help="run the benchmark suite")
    _common_flags(pb)
    pb.add_argument("--serving", action="store_true",
                    help="measure inference throughput (bench_infer) "
                         "instead of training")

    px = sub.add_parser(
        "export", help="serialize the serving program (on-device preprocess "
        "+ forward + exp) into a portable StableHLO artifact directory "
        "(jax.export); servable without the model code")
    _common_flags(px)
    px.add_argument("--out-dir", required=True,
                    help="artifact directory (serving.jaxexport, params.npz, "
                         "meta.json)")
    px.add_argument("--serving-batch", type=int,
                    help="pin a fixed batch size; default: batch-polymorphic "
                         "(one artifact, any batch)")
    px.add_argument("--raw-hw", type=int, nargs=2, default=[480, 640],
                    metavar=("H", "W"),
                    help="raw frame shape the artifact accepts (default "
                         "640x480 camera frames [B:10])")
    px.add_argument("--init", action="store_true",
                    help="export random-init params instead of requiring a "
                         "checkpoint (artifact plumbing tests)")
    px.add_argument("--ema", action="store_true",
                    help="bake the EMA (Polyak-averaged) weights into the "
                         "artifact (checkpoint trained with --ema-decay)")
    px.add_argument("--avg-last", type=int, metavar="K",
                    help="bake the uniform average of the last K retained "
                         "checkpoints into the artifact (post-hoc SWA; "
                         "exclusive with --ckpt-step)")

    ps = sub.add_parser(
        "serve", help="batched depth-serving HTTP server: concurrent "
        "requests coalesce into device batches (padded to power-of-2 "
        "buckets, no recompiles); POST npy frames to /v1/depth")
    _common_flags(ps)
    ps.add_argument("--artifact",
                    help="serve an exported artifact directory (from "
                         "`export`) instead of checkpoint + model code")
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--port", type=int, default=8000)
    ps.add_argument("--max-batch", type=int, default=32,
                    help="largest coalesced device batch (default 32)")
    ps.add_argument("--max-delay-ms", type=float, default=5.0,
                    help="batching window after the first queued request")
    ps.add_argument("--raw-hw", type=int, nargs=2, default=[480, 640],
                    metavar=("H", "W"),
                    help="accepted raw frame shape (checkpoint mode; "
                         "artifacts carry their own)")
    ps.add_argument("--init", action="store_true",
                    help="serve random-init params (smoke/testing)")
    ps.add_argument("--no-warmup", action="store_true",
                    help="skip precompiling the batch buckets at startup")
    ps.add_argument("--ema", action="store_true",
                    help="serve the EMA weights from the checkpoint")
    ps.add_argument("--dp", type=int, default=1,
                    help="shard each coalesced batch over this many local "
                         "devices (params replicated, batch split over the "
                         "data mesh axis); 0 = all local devices "
                         "(checkpoint mode only — artifacts are compiled "
                         "single-device)")

    pw = sub.add_parser(
        "sweep", help="hyperparameter grid search: sequential train+eval "
        "trials over --param axes, ledger in <out-dir>/sweep.jsonl, best "
        "trial in summary.json (the reference's SGE job-array sweeps, "
        "in-process)")
    _common_flags(pw)
    pw.add_argument("--param", action="append", default=[],
                    metavar="dotted.path=v1,v2,...", required=True,
                    help="one grid axis over a config field, e.g. "
                         "train.learning_rate=1e-4,3e-4 (repeatable; the "
                         "grid is the cartesian product)")
    pw.add_argument("--out-dir", required=True,
                    help="sweep root: per-trial subdirs + sweep.jsonl + "
                         "summary.json")
    pw.add_argument("--metric", default="rmse",
                    help="eval metric that ranks trials (rmse, abs_rel, "
                         "sq_rel, log10, rmse_log, silog, loss minimize; "
                         "delta1-3 maximize). default: rmse")
    pw.add_argument("--max-eval-batches", type=int,
                    help="bound each trial's eval (full test split "
                         "otherwise)")
    return p


def _default_compile_cache():
    """Persistent XLA compile cache unless the user already set one.

    First compiles of the fused train step cost 35-140 s on TPU; the
    cache cuts warm startups to seconds. jax reads the config lazily, so
    setting it here (after any site-level jax import) still works. Runs
    only after argparse succeeds (ADVICE r2: --help must not pay the jax
    import) and defers to a cache dir already set via env OR jax flags.
    """
    import os

    try:
        import jax
        if jax.config.jax_compilation_cache_dir:  # set via flags/env/code
            return
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "ann3depth_tpu", "xla")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization; never block the CLI
        pass


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    # orbax/absl emit a noisy INFO line per checkpoint op; keep WARNING+
    logging.getLogger("absl").setLevel(logging.WARNING)
    args = build_parser().parse_args(argv)
    _default_compile_cache()

    if args.mode == "train":
        if args.ckpt_step is not None:
            raise SystemExit("train reads checkpoints via --resume / "
                             "--resume-step, not --ckpt-step")
        if getattr(args, "multihost", False) or getattr(args, "coordinator",
                                                        None):
            from ann3depth_tpu.parallel import multihost
            multihost.initialize(coordinator=args.coordinator,
                                 num_processes=args.num_processes,
                                 process_id=args.process_id)
        from ann3depth_tpu.train import loop
        cfg = _resolve(args)
        _, metrics = loop.train(cfg, workdir=args.workdir)
        import jax
        if jax.process_index() == 0:
            print(json.dumps({k: float(v) for k, v in metrics.items()}))
        return 0

    if args.mode == "eval":
        import os

        from ann3depth_tpu.train import loop
        cfg = _resolve(args)
        common = dict(max_batches=args.max_batches,
                      report_worst=args.report_worst, tta=args.tta,
                      align=args.align, crop=args.crop)
        names = list(dict.fromkeys(cfg.data.datasets))  # dedupe, keep order
        if args.protocols:
            if len(names) > 1:
                raise SystemExit("--protocols is single-dataset (per-"
                                 "dataset protocol grids would nest two "
                                 "dicts; eval each dataset separately)")
            if args.report_dir:
                raise SystemExit("--protocols and --report-dir are "
                                 "exclusive (one report per variant would "
                                 "be ambiguous; run a plain eval "
                                 "--report-dir for attribution)")
            metrics = loop.evaluate_protocols(
                cfg, [t for t in args.protocols.split(",") if t],
                use_ema=args.ema, ckpt_step=args.ckpt_step,
                avg_last=args.avg_last, max_batches=args.max_batches,
                tta=args.tta or "flip", align=args.align or "median",
                crop=args.crop or "eigen")
            print(json.dumps(metrics))
            return 0
        if len(names) > 1:
            # Per-dataset metrics for multi-dataset configs (a model
            # trained on interleaved make3d+nyu evals each split on its
            # own terms; a blended RMSE would hide per-domain regressions).
            # Restore the checkpoint ONCE and share the state across
            # datasets — per-dataset restores would redo model init +
            # orbax deserialize + H2D of the param tree N times.
            try:
                state = loop.restore_state_for_eval(
                    cfg, use_ema=args.ema, ckpt_step=args.ckpt_step,
                    avg_last=args.avg_last)
            except ValueError as e:
                raise SystemExit(str(e))
            metrics = {}
            for n in names:
                rd = (os.path.join(args.report_dir, n)
                      if args.report_dir else None)
                metrics[n] = loop.evaluate(
                    cfg, state=state,
                    dataset=loop.build_dataset(cfg, "test", name=n),
                    report_dir=rd, **common)
        else:
            metrics = loop.evaluate(cfg, report_dir=args.report_dir,
                                    use_ema=args.ema,
                                    ckpt_step=args.ckpt_step,
                                    avg_last=args.avg_last, **common)
        print(json.dumps(metrics))
        return 0

    if args.mode == "live":
        from ann3depth_tpu.live import viewer
        cfg = _resolve(args)
        stats = viewer.run(cfg, camera=args.camera, video=args.video,
                           display=not args.no_display,
                           max_frames=args.max_frames, record=args.record,
                           ckpt_step=args.ckpt_step)
        print(json.dumps(stats))
        return 0

    if args.mode == "info":
        if args.ckpt_step is not None:
            raise SystemExit("info inspects the model definition, not a "
                             "checkpoint; --ckpt-step has no effect")
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ann3depth_tpu.models import registry
        from ann3depth_tpu.train import loop as looplib
        from ann3depth_tpu.train import step as steplib

        cfg = _resolve(args)
        model = registry.build(cfg.model)
        params = steplib.init_params(model, cfg.data.input_hw)
        n_params = int(sum(np.prod(l.shape)
                           for l in jax.tree.leaves(params)))
        out = jax.eval_shape(
            lambda p, x: model.apply({"params": p}, x), params,
            jax.ShapeDtypeStruct((1, *cfg.data.input_hw, 3), jnp.float32))
        info = {
            "model": cfg.model.name,
            "config": args.config,
            "compute_dtype": cfg.model.compute_dtype,
            "quant": cfg.model.quant,
            "params": n_params,
            "params_mib_f32": round(n_params * 4 / 2**20, 2),
            "input_hw": list(cfg.data.input_hw),
            "output_hw": list(out.shape[1:3]),
            "target_hw": list(looplib.resolved_target_hw(cfg)),
            "batch_size": cfg.train.batch_size,
            "registry": registry.available(),
        }
        if args.flops:
            from benchmarks import flops as flopslib
            fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
            x = jnp.zeros((1, *cfg.data.input_hw, 3), jnp.float32)
            fl = flopslib.step_flops(fwd, params, x)
            if fl:
                info["forward_gflops_per_image"] = round(fl / 1e9, 3)
            peak = flopslib.device_peak_flops()
            if peak:
                info["device_peak_tflops"] = round(peak / 1e12, 1)
                info["device_kind"] = jax.devices()[0].device_kind
        print(json.dumps(info))
        return 0

    if args.mode == "infer":
        import os

        import numpy as np
        from PIL import Image

        from ann3depth_tpu.train import loop
        from ann3depth_tpu.train import step as steplib
        from ann3depth_tpu.train.checkpoint import CheckpointManager
        from ann3depth_tpu.utils import viz

        if bool(args.image) == bool(args.video):
            raise SystemExit("infer needs exactly one of --image or --video")
        cfg = _resolve(args)
        if args.video:
            from ann3depth_tpu.live import transcode

            os.makedirs(args.out_dir, exist_ok=True)
            stem, ext = os.path.splitext(os.path.basename(args.video))
            out = os.path.join(args.out_dir, f"{stem}_depth{ext or '.avi'}")
            dnpy = (os.path.join(args.out_dir, f"{stem}_depth.npy")
                    if args.depth_npy else None)
            stats = transcode.transcode(
                cfg, args.video, out, batch=args.video_batch,
                side_by_side=args.side_by_side, depth_npy=dnpy,
                max_frames=args.max_frames, use_ema=args.ema,
                ckpt_step=args.ckpt_step, tta=args.tta)
            print(json.dumps(stats))
            return 0
        state = loop.create_state(cfg)
        ckpt = CheckpointManager(cfg.train.ckpt_dir)
        state, restored = ckpt.restore_params(state, use_ema=args.ema,
                                              step=args.ckpt_step)
        ckpt.close()
        if restored is None:
            raise RuntimeError(f"no checkpoint in {cfg.train.ckpt_dir}")
        os.makedirs(args.out_dir, exist_ok=True)
        outputs = []
        for path in args.image:
            img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
            depth = np.asarray(steplib.infer_step(
                state.apply_fn, state.params, img[None],
                input_hw=cfg.data.input_hw, tta=args.tta))[0]
            stem = os.path.splitext(os.path.basename(path))[0]
            npy = os.path.join(args.out_dir, f"{stem}_depth.npy")
            np.save(npy, depth)
            rec = {"image": path, "depth_npy": npy,
                   "depth_min_m": round(float(depth.min()), 3),
                   "depth_max_m": round(float(depth.max()), 3)}
            if not args.no_png:
                png = os.path.join(args.out_dir, f"{stem}_depth.png")
                viz.save_png(png, viz.colormap_depth(
                    depth, cmap=cfg.live.colormap))
                rec["depth_png"] = png
            if args.ply:
                from ann3depth_tpu.utils import pointcloud

                h, w = depth.shape[:2]
                colors = np.asarray(
                    Image.fromarray(img).resize((w, h), Image.BILINEAR))
                ply = os.path.join(args.out_dir, f"{stem}_cloud.ply")
                rec["ply"] = ply
                rec["ply_points"] = pointcloud.depth_to_ply(
                    ply, depth, rgb=colors, fov_deg=args.fov_deg)
            outputs.append(rec)
        print(json.dumps(outputs))
        return 0

    if args.mode == "export":
        from ann3depth_tpu import serving
        from ann3depth_tpu.train import loop
        from ann3depth_tpu.train.checkpoint import CheckpointManager

        cfg = _resolve(args)
        state = loop.create_state(cfg)
        if not args.init:
            ckpt = CheckpointManager(cfg.train.ckpt_dir)
            if args.avg_last:
                if args.ckpt_step is not None:
                    raise SystemExit("--avg-last and --ckpt-step are "
                                     "exclusive")
                state, restored = ckpt.restore_avg_params(
                    state, args.avg_last, use_ema=args.ema)
            else:
                state, restored = ckpt.restore_params(state,
                                                      use_ema=args.ema,
                                                      step=args.ckpt_step)
            ckpt.close()
            if restored is None:
                raise RuntimeError(
                    f"no checkpoint in {cfg.train.ckpt_dir}; pass --init to "
                    "export random-init params")
        meta = serving.export_serving(
            cfg, state.params, args.out_dir,
            batch=args.serving_batch, raw_hw=tuple(args.raw_hw),
            config_name=args.config)
        print(json.dumps(meta))
        return 0

    if args.mode == "serve":
        import logging as _logging

        from ann3depth_tpu import server as serverlib

        svc_kw = dict(max_batch=args.max_batch,
                      max_delay_s=args.max_delay_ms / 1e3)
        if args.artifact:
            if args.ema or args.ckpt_step is not None:
                raise SystemExit(
                    "--ema/--ckpt-step have no effect with --artifact: "
                    "the artifact's weights were baked at export time "
                    "(re-export with those flags instead)")
            if args.dp != 1:
                raise SystemExit(
                    "--dp requires checkpoint mode: an exported artifact "
                    "is a single-device program (its shardings were fixed "
                    "at export time)")
            service = serverlib.service_from_artifact(args.artifact, **svc_kw)
        else:
            cfg = _resolve(args)
            service = serverlib.service_from_config(
                cfg, init=args.init, raw_hw=tuple(args.raw_hw),
                use_ema=args.ema, ckpt_step=args.ckpt_step, dp=args.dp,
                **svc_kw)
        if not args.no_warmup:
            # the service's ACTUAL bucket list (a fixed-batch artifact
            # pins it to one bucket regardless of --max-batch)
            _logging.getLogger(__name__).info(
                "warming up %d batch buckets...", len(service._buckets))
            service.warmup()
        srv = serverlib.DepthServer(service, host=args.host, port=args.port)
        print(json.dumps({"listening": f"http://{args.host}:{srv.port}",
                          "raw_hw": list(service.raw_hw),
                          "max_batch": service.max_batch}), flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            srv.close()
        return 0

    if args.mode == "sweep":
        from ann3depth_tpu import sweep as sweeplib

        cfg = _resolve(args)
        grid = [sweeplib.parse_param(spec) for spec in args.param]
        result = sweeplib.run_sweep(cfg, grid, args.out_dir,
                                    metric=args.metric,
                                    max_eval_batches=args.max_eval_batches)
        print(json.dumps({"best": result["best"],
                          "n_trials": len(result["rows"]),
                          "summary": result["summary_path"]}))
        return 0

    if args.mode == "download":
        from ann3depth_tpu.data import download
        download.download(args.dataset, args.data_dir,
                          record=args.record_checksums)
        return 0

    if args.mode == "prepare":
        import os

        from ann3depth_tpu.data import records

        if args.dataset == "synthetic":
            from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
            ds = SyntheticDepthDataset()
        elif args.dataset == "make3d":
            from ann3depth_tpu.data.make3d import Make3DDataset
            ds = Make3DDataset(args.data_dir, split=args.split)
        else:
            from ann3depth_tpu.data.nyu import NYUDataset
            ds = NYUDataset(args.data_dir, split=args.split)
        out_dir = args.out_dir or os.path.join(args.data_dir, "records")
        index = records.pack(ds, out_dir, args.split,
                             shard_size=args.shard_size, format=args.format)
        print(json.dumps({"index": index, "examples": len(ds)}))
        return 0

    if args.mode == "bench":
        if args.ckpt_step is not None:
            raise SystemExit("bench runs random-init params; --ckpt-step "
                             "has no checkpoint to pin")
        cfg = _resolve(args)
        if cfg.model.quant == "int8" and not args.serving:
            # int8 convs round() has zero gradient — a "training" bench of
            # the quantized model would be meaningless (ADVICE r2); the
            # same guard loop.train applies for real training. int8-qat
            # trains (STE), so benching its step cost is legitimate.
            raise SystemExit(
                "--quant int8 is serving-only; pass --serving for the "
                "inference bench or drop --quant for the training bench")
        try:
            from benchmarks import bench_infer, bench_train
        except ImportError:
            # benchmarks/ is repo tooling, deliberately not shipped in the
            # wheel; every other subcommand works from an install.
            raise SystemExit(
                "the bench subcommand needs the repository checkout "
                "(benchmarks/ is not part of the installed package); run "
                "from a clone or `pip install -e .`")
        if args.serving:
            print(json.dumps(bench_infer.run(
                cfg, batch=args.batch_size or 32)))
        else:
            print(json.dumps(bench_train.run(cfg)))
        return 0

    raise AssertionError(args.mode)


if __name__ == "__main__":
    sys.exit(main())
