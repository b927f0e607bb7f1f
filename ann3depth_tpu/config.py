"""Typed configs + named presets mirroring BASELINE.json configs [B:6-12].

The reference drove everything from argparse flags (SURVEY.md §5 "Config /
flag system"); here each CLI invocation resolves to one frozen dataclass so
jitted code closes over static values only.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from ann3depth_tpu.compat import reference_spec as ref


@dataclasses.dataclass(frozen=True)
class DataConfig:
    datasets: Tuple[str, ...] = ("make3d",)  # make3d | nyu | synthetic
    data_dir: str = "data"
    input_hw: Tuple[int, int] = (ref.INPUT_H, ref.INPUT_W)
    # NOTE: there is deliberately no target_hw field — the depth-target
    # shape is a function of the model's output stride and is derived in
    # train/loop.resolved_target_hw, so presets cannot mismatch the head.
    augment: bool = False          # flip/crop/jitter (fused on device) [B:9]
    # Device preprocess implementation: identical math either way
    # (ops/pallas_preprocess.py). "xla" measured faster *inside* the fused
    # train step on v5e (2.42 vs 3.02 ms/step @ b16: the custom call is a
    # fusion barrier); "pallas" is the hand kernel (faster standalone).
    preprocess_impl: str = "xla"   # "xla" | "pallas"
    prefetch: int = 2              # depth of the double-buffered device feed
    # Host input pipeline: grain's worker pool parallelizes JPEG/.mat decode
    # on multi-core TPU hosts (pipeline/grain_loader.py). On this 1-core dev
    # host the built-in epoch iterator is just as fast, so grain is opt-in.
    use_grain: bool = False
    num_workers: int = 0           # grain worker processes (0 = in-process)
    # Stage the whole raw dataset into device HBM once and gather batches
    # on device (pipeline/device_cache.py): zero steady-state H2D traffic.
    # For uniform-shape datasets that fit the HBM budget (Make3D raw is
    # ~4 GB; v5e has 16 GB). Multi-device meshes shard the pool and
    # shuffle shard-locally.
    cache_device: bool = False
    # >0 with cache_device: rotating-window pool for datasets LARGER than
    # the HBM budget (pipeline/streaming_pool.py) — two window buffers
    # resident, the next window stages in a background thread while the
    # active one trains. Window-granular global shuffle per pass.
    cache_window_mb: int = 0
    # Data echoing (Choi et al. 2019): train this many shard-local passes
    # over each window before rotating — divides the host-link bandwidth
    # demand by the factor. Needs cache_window_mb > 0. 0 = auto: calibrate
    # the factor from one measured window staging + one training pass
    # (streaming_pool.calibrate_window_epochs; CLI `--window-epochs auto`).
    window_epochs: int = 1
    # Synthetic-dataset geometry (datasets=("synthetic",) only): train
    # split size and raw shapes; the test split is synth_test_n examples
    # at the same shapes with a disjoint seed. Defaults are the tiny
    # smoke set; the benchmarks' convergence protocol (BASELINE.md) is
    # `--synth-n 512 --synth-hw 360 480 --synth-depth-hw 180 240` — the
    # product-path CLI can reproduce the harness protocol exactly (r5).
    synth_n: int = 64
    synth_test_n: int = 64
    synth_img_hw: Tuple[int, int] = (96, 128)
    synth_depth_hw: Tuple[int, int] = (48, 64)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str = "encdec"           # registry key (models/registry.py)
    compute_dtype: str = "bfloat16"  # MXU-native compute; params stay f32
    width_mult: float = 1.0
    remat: bool = False            # jax.checkpoint stage blocks (HBM vs FLOPs)
    # "int8": serving-only int8 MXU convs (encdec), dynamic activation
    # scales, param tree unchanged — +12-14% serving throughput, priced on
    # TRAINED weights at +0.68% eval RMSE (r3 convergence study,
    # benchmarks/exp_convergence.py). Rejected for training (round()
    # kills gradients); loop.train rejects it.
    # "int8-qat": quantization-aware TRAINING (encdec) — fake-quant convs
    # with straight-through gradients, so the optimizer sees the int8
    # forward; the resulting checkpoint serves with --quant int8 at ~zero
    # divergence (ops/quant.qconv_fake).
    quant: str = "none"            # "none" | "int8" | "int8-qat"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 16
    # >1: split each global batch into grad_accum sequential microbatches
    # inside ONE jitted step (lax.scan accumulates mean grads + metric
    # stats, one optimizer update). Peak activation memory = one
    # microbatch, so effective batches beyond HBM train without host
    # round-trips; equal to a full-batch step up to f32 reassociation
    # (tests/test_grad_accum.py). batch_size % grad_accum == 0, and the
    # microbatch must divide the mesh's data axis.
    grad_accum: int = 1
    # ZeRO-1 optimizer-state sharding (parallel/zero1.py): grads
    # reduce-scattered into 1/N chunks, Adam on the local chunk only,
    # params all-gathered — same per-step bytes as replicated DP, 1/N
    # optimizer memory + update FLOPs. Same warmup/cosine schedule as the
    # replicated path; composes with grad_accum and ema_decay (r3).
    zero1: bool = False
    # >0: maintain an exponential moving average of params inside the
    # jitted step (classic Polyak averaging; 0.999-ish). The EMA tree is
    # checkpointed alongside params; evaluate/CLI eval --ema score it.
    ema_decay: float = 0.0
    # >1: tensor parallelism width — the mesh gains a "model" axis of
    # this size and the DPT transformer's attention heads / MLP hidden
    # shard over it (parallel/sharding_rules.py); jit's propagation
    # inserts the TP collectives over ICI. DPT-family models only (the
    # CNNs have no rule matches and would waste the axis — SURVEY §2.3).
    tensor_parallel: int = 1
    steps: int = 1000
    learning_rate: float = ref.DEFAULT_LEARNING_RATE
    warmup_steps: int = 100
    # Update rule + hyperparameters (train/step.make_optimizer; the zero1
    # path shares them so --zero1 trains the same optimizer). For sgd,
    # adam_b1 doubles as the momentum coefficient.
    optimizer: str = "adamw"       # "adamw" | "adam" | "sgd"
    # "cosine" (warmup + cosine decay to ~0 over `steps`) or "constant"
    # (flat lr after warmup — the TF1-era reference regime).
    schedule: str = "cosine"
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    weight_decay: float = 0.0
    clip_norm: float = 1.0         # global-norm gradient clip (<=0: off)
    # Periodic cadences, in steps. 0 disables the periodic action (the
    # final step still logs and checkpoints — eval/infer need a last save).
    checkpoint_every: int = 500
    log_every: int = 50
    eval_every: int = 500
    # >1: fold this many train steps into ONE jitted lax.scan program per
    # dispatch (cache-device runs only — the pool and the whole sampling
    # stream live in HBM, so K steps need zero host round-trips). This is
    # the scan-of-K the benchmarks use, promoted to the real loop: it
    # removes the per-step dispatch boundary that costs ~2.5-3x loop-level
    # throughput on high-latency links (tunnel) and a few % locally.
    # log/checkpoint/eval cadences and `steps` must be multiples of it
    # (metrics surface at block boundaries; the block's last step is
    # logged). Composes with grad_accum / zero1 / ema / distill.
    steps_per_dispatch: int = 1
    # >0: stop training when the in-loop eval RMSE hasn't improved by at
    # least early_stop_min_delta for this many CONSECUTIVE evals
    # (requires eval_every > 0). The reference ran a fixed step budget;
    # this is driver completeness for real-data runs where the budget is
    # unknown. The eval compared is the 4-batch in-loop sample, so set
    # eval_every/patience generously on noisy data.
    early_stop_patience: int = 0
    early_stop_min_delta: float = 0.0
    # Keep a separate best-eval checkpoint under <ckpt_dir>/best/ (one
    # retained step, overwritten whenever the in-loop eval RMSE improves;
    # requires eval_every > 0). Unlike early stopping's in-memory best
    # weights, this survives crashes and resumes: <ckpt_dir>/best_metric
    # .json pins the RMSE the retained step scored, so a resumed run only
    # overwrites it with a genuine improvement. Serve/eval it by pointing
    # --ckpt-dir at <ckpt_dir>/best.
    save_best: bool = False
    ckpt_dir: str = "checkpoints"
    resume: bool = False
    # Resume from a SPECIFIC checkpoint step instead of the latest
    # (rollback after a bad phase / bisection). Implies resume; newer
    # checkpoints are deleted so the continued run's saves don't collide
    # with the abandoned timeline.
    resume_step: Optional[int] = None
    tensorboard: bool = False  # also write tf.summary event files
    seed: int = 0
    # Training loss (train/losses.py): "si" (Eigen eq. 4 scale-invariant
    # log loss, the reference's [B:5] default), "si+grad" (si plus the
    # Eigen & Fergus 2015 first-order log-gradient matching term at the
    # paper's unit weight — depth-structure supervision), "l2"
    # (linear-depth MSE — the 'standard L2 variant' of SURVEY §2.1's loss
    # row), "berhu" (reverse Huber, Laina et al. 2016). Eval error
    # metrics are loss-independent; the logged `loss` follows this choice.
    loss: str = "si"
    si_lambda: float = ref.SI_LOSS_LAMBDA
    # Knowledge distillation (train/step.distill_train_step): non-empty ->
    # restore a frozen teacher from this checkpoint dir and add
    # distill_alpha * mean((student_log - teacher_log)^2) to the loss,
    # teacher forward fused into the same jitted step. Completes the
    # compression ladder (train encdec-w2 once, distill into the cheap
    # serving model). Exclusive with zero1 / tensor_parallel / grad_accum
    # (loud errors in loop.train; compose on demand).
    distill_from: str = ""
    # Teacher architecture: registry name ("" = same as the student) and
    # its width multiplier — must match what trained distill_from.
    distill_model: str = ""
    distill_width_mult: float = 1.0
    distill_alpha: float = 0.5
    # Profiling (SURVEY §5 "Tracing / profiling"): when profile_dir is set,
    # the train loop wraps a window of hot-loop steps (after compile +
    # warmup) in a jax.profiler trace -> TensorBoard/Perfetto under
    # <profile_dir>. Off by default: tracing adds host overhead.
    profile_dir: str = ""
    profile_steps: int = 20


@dataclasses.dataclass(frozen=True)
class LiveConfig:
    frame_hw: Tuple[int, int] = (ref.LIVE_FRAME_H, ref.LIVE_FRAME_W)
    target_fps: int = 30
    ring_capacity: int = 8
    camera_index: int = 0
    # >0: temporal EMA over frames in log-depth inside the live program
    # (logd_t = smooth*logd_{t-1} + (1-smooth)*logd) — kills frame-to-
    # frame flicker at zero extra dispatches; first frame passes through.
    smooth: float = 0.0
    # Depth rendering colormap for live/video/PNG surfaces (a 256-entry
    # device-side LUT gather either way): turbo | viridis | magma | gray
    # (live/infer._CMAP_ANCHORS; the reference's matplotlib-era choice).
    colormap: str = "turbo"


@dataclasses.dataclass(frozen=True)
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    live: LiveConfig = dataclasses.field(default_factory=LiveConfig)


def _cfg(**kw) -> Config:
    out = Config()
    for section, overrides in kw.items():
        out = dataclasses.replace(
            out, **{section: dataclasses.replace(getattr(out, section), **overrides)}
        )
    return out


# Named presets, one per BASELINE.json config line [B:7-11].
PRESETS = {
    # [B:7] Make3D: single 320x240 image -> 3-conv downsample net, batch=1.
    "make3d-small": _cfg(
        data={"datasets": ("make3d",)},
        model={"name": "small", "compute_dtype": "float32"},
        train={"batch_size": 1, "steps": 100},
    ),
    # [B:8] Make3D: full encoder-decoder train, 320x240 in / 160x120 out, b16.
    "make3d-encdec": _cfg(
        data={"datasets": ("make3d",)},
        model={"name": "encdec"},
        train={"batch_size": 16},
    ),
    # Multi-scale coarse+fine CNN (Eigen et al. 2014 family) — the third
    # classic architecture of the reference's era, re-designed TPU-first
    # (global context via GAP+MLP instead of the paper's FC layers; one
    # shared s2d stem; fine stack predicts a residual on the coarse map —
    # models/multiscale.py). Same shapes/batch as the encdec parity point.
    "make3d-multiscale": _cfg(
        data={"datasets": ("make3d",)},
        model={"name": "multiscale"},
        train={"batch_size": 16},
    ),
    # [B:9] NYU Depth v2: encoder-decoder + fused flip/crop/jitter pipeline.
    "nyu-encdec-aug": _cfg(
        data={"datasets": ("nyu",), "augment": True},
        model={"name": "encdec"},
        train={"batch_size": 16},
    ),
    # [B:10] Live stream config (model served at 320x240 from 640x480 frames).
    "live": _cfg(
        model={"name": "encdec"},
    ),
    # [B:11] DPT-style ViT depth model at 384x384 (stretch).
    # batch 16, remat=False: the r3 sweep's winner (622 img/s MFU 0.464
    # vs b8's 568; b8/b16 with remat and b16-serving sweeps in
    # BASELINE.md). Still fits HBM without remat; set remat=True only
    # for larger batches.
    "dpt-384": _cfg(
        data={
            "datasets": ("nyu",),
            "input_hw": (ref.DPT_RES, ref.DPT_RES),
        },
        model={"name": "dpt"},
        train={"batch_size": 16},
    ),
    # Quality preset beyond the reference's capacity (r3 pricing,
    # BASELINE.md): width-2 encdec buys -4.2% eval RMSE at 1.73x step
    # time and runs the MXU at 0.59-0.70 MFU (the parity widths leave it
    # half idle). b64: the width-2 train-throughput peak.
    "encdec-w2": _cfg(
        data={"datasets": ("make3d",)},
        model={"name": "encdec", "width_mult": 2.0},
        train={"batch_size": 64},
    ),
    # Best-measured quality stack (r4, benchmarks/exp_w2_best.py): the
    # levers BASELINE.md priced independently, composed and re-measured as
    # ONE training run — width-2 capacity (-4.2% eval RMSE alone), fused
    # flip/crop-zoom/photometric augmentation (-1.2% on w1), and the
    # si+grad loss (-1.74%). b64 is width-2's train-throughput peak
    # (MFU 0.697). Eval this preset with `--tta flip` (offline-only
    # ensemble, -3..4% more) and, for scale-ambiguous protocols,
    # `--align median`; the measured composition number lives in
    # BASELINE.md's w2-best row.
    "encdec-w2-best": _cfg(
        data={"datasets": ("make3d",), "augment": True},
        model={"name": "encdec", "width_mult": 2.0},
        train={"batch_size": 64, "loss": "si+grad"},
    ),
    # Best-measured DPT quality recipe (r4, benchmarks/exp_dpt_levers.py
    # 2x2 grid on trained weights): `--loss si+grad` is the one training
    # lever that pays on DPT at the 2500-step protocol (-2.71% eval RMSE;
    # -4.57% with the eval-side `--tta flip`). Augmentation did NOT
    # compose at that budget (still paying its convergence tax — add it
    # back on long real-data schedules). b16 stays the throughput winner.
    "dpt-384-best": _cfg(
        data={
            "datasets": ("nyu",),
            "input_hw": (ref.DPT_RES, ref.DPT_RES),
        },
        model={"name": "dpt"},
        train={"batch_size": 16, "loss": "si+grad"},
    ),
    # Throughput preset (BASELINE.md batch-ladder row): XLA picks a
    # distinctly better conv tiling at b128 — train MFU 0.473 / 11.8k
    # img/s vs 0.335 / 8.3k at the b16 parity point. For
    # capacity-insensitive training runs on the parity-width model; the
    # recommendation previously lived only in BASELINE.md prose
    # (VERDICT r3 Weak #2).
    "encdec-b128": _cfg(
        data={"datasets": ("make3d",)},
        model={"name": "encdec"},
        train={"batch_size": 128},
    ),
    # Test/smoke preset: synthetic data, tiny everything.
    "smoke": _cfg(
        data={"datasets": ("synthetic",)},
        model={"name": "small", "compute_dtype": "float32"},
        train={"batch_size": 2, "steps": 10, "log_every": 5,
               "checkpoint_every": 5, "eval_every": 0},
    ),
}


def get_config(name: str) -> Config:
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(f"unknown config preset {name!r}; have {sorted(PRESETS)}")
