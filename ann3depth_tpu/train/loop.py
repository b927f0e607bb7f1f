"""Training driver (SURVEY.md §1 L4, §3.1): the reference's train() surface.

Wires config -> dataset -> mesh/sharding -> model/state -> double-buffered
feed -> jitted step loop, with periodic metrics, eval, and async
checkpointing + resume [B:5].
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import numpy as np

from ann3depth_tpu.config import Config
from ann3depth_tpu.models import registry
from ann3depth_tpu.parallel import mesh as meshlib
from ann3depth_tpu.pipeline.feed import DeviceFeed
from ann3depth_tpu.train import step as steplib
from ann3depth_tpu.train.checkpoint import CheckpointManager
from ann3depth_tpu.utils.metrics_writer import MetricsWriter

log = logging.getLogger(__name__)


def build_dataset(cfg: Config, split="train", name=None):
    """Dataset factory: name -> raw (uint8 rgb, f32 depth) batch source.

    Prefers pre-packed record shards (`prepare` subcommand) when present —
    zero decode work per epoch; falls back to the raw-file loaders.
    """
    name = name or cfg.data.datasets[0]
    if name == "synthetic":
        from ann3depth_tpu.data.synthetic import SyntheticDepthDataset
        train = split == "train"
        return SyntheticDepthDataset(
            n=cfg.data.synth_n if train else cfg.data.synth_test_n,
            img_hw=tuple(cfg.data.synth_img_hw),
            depth_hw=tuple(cfg.data.synth_depth_hw),
            seed=0 if train else 1)

    from ann3depth_tpu.data import records
    index = records.find_index(
        os.path.join(cfg.data.data_dir, "records"), name, split)
    if index:
        log.info("using packed records: %s", index)
        return records.RecordDataset(index)

    if name == "make3d":
        from ann3depth_tpu.data.make3d import Make3DDataset
        return Make3DDataset(cfg.data.data_dir, split=split)
    if name == "nyu":
        from ann3depth_tpu.data.nyu import NYUDataset
        return NYUDataset(cfg.data.data_dir, split=split)
    raise KeyError(f"unknown dataset {name!r}")


def _use_pallas(cfg: Config) -> bool:
    """Pallas preprocess requires a TPU backend; see DataConfig.preprocess_impl."""
    return cfg.data.preprocess_impl == "pallas" and jax.default_backend() == "tpu"


def resolved_target_hw(cfg: Config):
    """Depth-target resolution is a function of the model's output stride
    (e.g. encdec: 320x240 -> 160x120 [B:8]); derive it so config presets
    can't silently mismatch the head shape."""
    return registry.output_hw(cfg.model.name, cfg.data.input_hw)


def create_state(cfg: Config, mesh=None):
    """Build model + optimizer + TrainState (replicated, or TP-sharded
    params when cfg.train.tensor_parallel > 1 and the mesh has a "model"
    axis)."""
    model = registry.build(cfg.model)
    params = steplib.init_params(model, cfg.data.input_hw, seed=cfg.train.seed)
    tx = steplib.make_optimizer(
        cfg.train.learning_rate, cfg.train.warmup_steps, cfg.train.steps,
        b1=cfg.train.adam_b1, b2=cfg.train.adam_b2,
        weight_decay=cfg.train.weight_decay, clip_norm=cfg.train.clip_norm,
        optimizer=cfg.train.optimizer, schedule=cfg.train.schedule)
    if (mesh is not None and cfg.train.tensor_parallel > 1
            and "model" in mesh.shape):
        from ann3depth_tpu.parallel import sharding_rules as rules
        params = rules.shard_params(params, mesh, tensor_parallel=True)
        # tx.init/jnp.copy run eagerly on the sharded params, so Adam
        # moments and the EMA tree inherit the TP shardings; the scalar
        # leaves (step, schedule/Adam counts) land on a single device and
        # must be replicated explicitly or jit rejects the device mix.
        # meshlib.replicate on the whole state would destroy the param
        # shardings — place only the 0-d leaves.
        state = steplib.TrainState.create(model.apply, params, tx,
                                          ema=cfg.train.ema_decay > 0)
        # meshlib.replicate (not device_put) so the multi-process path
        # goes through make_array_from_callback like everything else.
        scalars_replicated = jax.tree.map(
            lambda l: (meshlib.replicate(l, mesh)
                       if getattr(l, "ndim", None) == 0 else l),
            state.opt_state)
        return state.replace(step=meshlib.replicate(state.step, mesh),
                             opt_state=scalars_replicated)
    state = steplib.TrainState.create(model.apply, params, tx,
                                      ema=cfg.train.ema_decay > 0)
    if mesh is not None:
        state = meshlib.replicate(state, mesh)
    return state


def train(cfg: Config, *, workdir: Optional[str] = None, mesh=None,
          dataset=None, progress=True):
    """Run cfg.train.steps of training; returns (state, last_metrics).

    Resumable: with cfg.train.resume, restores the latest checkpoint from
    cfg.train.ckpt_dir and continues the step counter (SURVEY §5).
    """
    workdir = workdir or cfg.train.ckpt_dir
    nproc = jax.process_count()
    proc0 = jax.process_index() == 0
    if nproc > 1 and cfg.train.batch_size % nproc:
        raise ValueError(
            f"global batch_size={cfg.train.batch_size} is not divisible by "
            f"{nproc} processes")
    if cfg.model.quant not in ("none", "int8-qat"):
        raise ValueError(
            f"model.quant={cfg.model.quant!r} is a serving-only path "
            "(round() has zero gradient — training would silently freeze "
            "the conv weights); train with quant='none', or quant="
            "'int8-qat' for quantization-aware training, and pass "
            "--quant int8 to eval/live/infer")
    if cfg.train.batch_size <= 0:
        raise ValueError(
            f"batch_size must be positive, got {cfg.train.batch_size}")
    accum = cfg.train.grad_accum
    if accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {accum}")
    for name in ("log_every", "checkpoint_every", "eval_every"):
        if getattr(cfg.train, name) < 0:
            raise ValueError(
                f"{name} must be >= 0 (0 disables the periodic cadence; "
                f"the final step still logs/saves), got "
                f"{getattr(cfg.train, name)}")
    if cfg.train.batch_size % accum:
        raise ValueError(
            f"batch_size={cfg.train.batch_size} is not divisible by "
            f"grad_accum={accum}")
    if cfg.data.cache_device and (cfg.data.use_grain
                                  or len(cfg.data.datasets) > 1):
        raise ValueError(
            "cache_device is exclusive with use_grain and multi-dataset "
            "interleave — one resident pool, one source")
    if cfg.data.cache_window_mb < 0:
        raise ValueError(
            f"cache_window_mb must be >= 0, got {cfg.data.cache_window_mb}")
    if cfg.data.cache_window_mb and not cfg.data.cache_device:
        raise ValueError(
            "cache_window_mb configures the rotating-window DEVICE cache — "
            "add --cache-device (host-fed runs have no resident pool to "
            "window)")
    if cfg.data.window_epochs < 0:
        raise ValueError(
            f"window_epochs must be >= 1 (or 0 = auto-calibrate), got "
            f"{cfg.data.window_epochs}")
    if cfg.data.window_epochs != 1 and not cfg.data.cache_window_mb:
        raise ValueError(
            "window_epochs (data echoing) repeats WINDOW passes — it needs "
            "--cache-window-mb; a full resident pool already revisits every "
            "example each epoch")
    spd = cfg.train.steps_per_dispatch
    if spd < 1:
        raise ValueError(f"steps_per_dispatch must be >= 1, got {spd}")
    if spd > 1:
        if not cfg.data.cache_device:
            raise ValueError(
                f"steps_per_dispatch={spd} needs --cache-device: folding "
                "K steps into one device program requires the data pool "
                "resident in HBM (a host-fed step can't be scanned)")
        bad = [f"{name}={v}" for name, v in
               (("steps", cfg.train.steps),
                ("log_every", cfg.train.log_every),
                ("checkpoint_every", cfg.train.checkpoint_every),
                ("eval_every", cfg.train.eval_every))
               if v and v % spd]
        if bad:
            raise ValueError(
                f"steps_per_dispatch={spd} must divide the step cadences "
                f"(the loop only regains control at block boundaries); "
                f"offending: {', '.join(bad)}")
    if cfg.train.early_stop_patience < 0:
        raise ValueError("early_stop_patience must be >= 0, got "
                         f"{cfg.train.early_stop_patience}")
    if cfg.train.early_stop_patience and not cfg.train.eval_every:
        raise ValueError(
            "early_stop_patience needs in-loop eval to watch: set "
            "eval_every > 0 (the stop criterion is the eval RMSE)")
    if cfg.train.save_best and not cfg.train.eval_every:
        raise ValueError(
            "save_best needs in-loop eval to rank checkpoints: set "
            "eval_every > 0")
    if cfg.train.distill_from:
        if cfg.train.zero1 or cfg.train.tensor_parallel > 1 or accum > 1:
            raise ValueError(
                "distill_from composes with plain data-parallel training "
                "only; zero1 / tensor_parallel / grad_accum are not wired "
                "into the distillation step (loud by design — compose on "
                "demand)")
        if not 0.0 < cfg.train.distill_alpha <= 1.0:
            raise ValueError(
                f"distill_alpha must be in (0, 1], got "
                f"{cfg.train.distill_alpha} (0 would silently ignore the "
                "teacher — drop --distill-from instead)")
        if _use_pallas(cfg):
            log.warning("preprocess_impl='pallas' is ignored under "
                        "distillation (its step uses the XLA preprocess)")
    tp = cfg.train.tensor_parallel
    if tp < 1:
        raise ValueError(f"tensor_parallel must be >= 1, got {tp} "
                         "(1 = no tensor parallelism)")
    if tp > 1:
        # Tensor parallelism (SURVEY §2.3 TP row): 2-D (data, model) mesh;
        # DPT q/k/v/out + MLP params shard over "model"
        # (parallel/sharding_rules.py via create_state above).
        if not cfg.model.name.startswith("dpt"):
            raise ValueError(
                f"tensor_parallel={tp} requires a dpt-family model (the "
                f"TP sharding rules only match the ViT transformer; "
                f"{cfg.model.name!r} would replicate params and waste the "
                "model axis)")
        if cfg.train.zero1:
            raise ValueError(
                "tensor_parallel with zero1 is not wired (the ZeRO-1 "
                "shard_map collectives are data-axis only)")
        if mesh is None:
            mesh = meshlib.auto_data_mesh(cfg.train.batch_size // accum,
                                          tp=tp)
        elif mesh.shape.get("model", 1) != tp:
            raise ValueError(
                f"passed mesh has model axis {mesh.shape.get('model', 1)}"
                f", config wants tensor_parallel={tp}")
    if mesh is None:
        # Shared auto-mesh policy (meshlib.auto_data_mesh): the per-step
        # unit that shards over "data" is the microbatch when grad_accum>1.
        mesh = meshlib.auto_data_mesh(cfg.train.batch_size // accum)
        n_data = mesh.shape.get("data", 1)
    else:
        n_data = mesh.shape.get("data", 1)
        if (cfg.train.batch_size // accum) % n_data:
            raise ValueError(
                f"microbatch {cfg.train.batch_size}//{accum} is not "
                f"divisible by the mesh's {n_data}-way data axis; raise "
                "the batch size or pass a smaller mesh")
    # An explicitly passed dataset overrides the config's dataset list;
    # otherwise every configured dataset trains (batch-interleaved).
    extra_datasets = []
    if dataset is None:
        dataset = build_dataset(cfg, "train")
        extra_datasets = [build_dataset(cfg, "train", name=n)
                          for n in cfg.data.datasets[1:]]
    # Multi-host: each process reads its strided shard of every dataset and
    # feeds batch_size/nproc rows per step; DeviceFeed assembles the global
    # batch from the per-process shards (parallel/multihost.py). The device
    # cache is the exception — DevicePoolSampler owns its own process
    # partition and must see the full dataset.
    feed_batch_size = cfg.train.batch_size
    if nproc > 1 and not cfg.data.cache_device:
        from ann3depth_tpu.data.batching import ProcessShardView
        dataset = ProcessShardView(dataset, jax.process_index(), nproc)
        extra_datasets = [ProcessShardView(d, jax.process_index(), nproc)
                          for d in extra_datasets]
        feed_batch_size = cfg.train.batch_size // nproc

    zstep = None
    if cfg.train.zero1:
        # ZeRO-1: sharded optimizer state + explicit collectives
        # (parallel/zero1.py), same TrainState facade so checkpointing,
        # eval, and the loop body below stay identical. The facade's
        # tx=None marks "optimizer lives inside zstep".
        import jax.numpy as jnp

        from ann3depth_tpu.parallel import zero1 as zero1lib

        if _use_pallas(cfg):
            log.warning("preprocess_impl='pallas' is ignored under zero1 "
                        "(its step uses the XLA preprocess)")
        model = registry.build(cfg.model)
        host_params = steplib.init_params(model, cfg.data.input_hw,
                                          seed=cfg.train.seed)
        ema_decay = cfg.train.ema_decay
        init_fn, zstep_raw = zero1lib.make_zero1_train_step(
            mesh, model.apply, host_params,
            input_hw=cfg.data.input_hw, target_hw=resolved_target_hw(cfg),
            si_lambda=cfg.train.si_lambda, augment=cfg.data.augment,
            loss_kind=cfg.train.loss,
            resize_precision="default",
            learning_rate=steplib.make_schedule(
                cfg.train.learning_rate, cfg.train.warmup_steps,
                cfg.train.steps, cfg.train.schedule),
            b1=cfg.train.adam_b1, b2=cfg.train.adam_b2,
            weight_decay=cfg.train.weight_decay,
            clip_norm=cfg.train.clip_norm,
            grad_accum=accum, ema_decay=ema_decay,
            optimizer=cfg.train.optimizer)
        params = meshlib.replicate(host_params, mesh)
        state = steplib.TrainState(
            step=meshlib.replicate(jnp.zeros((), jnp.int32), mesh),
            params=params, opt_state=init_fn(params),
            tx=None, apply_fn=model.apply,
            # EMA seeds from a HOST-SIDE COPY of the init params: replicate
            # (device_put) of the same host buffers is cached, and aliased
            # params/ema arrays double-donate in the step.
            ema_params=(meshlib.replicate(
                jax.tree.map(np.copy, host_params), mesh)
                if ema_decay > 0 else None))

        if ema_decay > 0:
            def zstep(state, img_u8, depth, rng):
                p, o, s, e, metrics = zstep_raw(
                    state.params, state.opt_state, state.step,
                    state.ema_params, img_u8, depth, rng)
                return state.replace(params=p, opt_state=o, step=s,
                                     ema_params=e), metrics
        else:
            def zstep(state, img_u8, depth, rng):
                p, o, s, metrics = zstep_raw(
                    state.params, state.opt_state, state.step,
                    img_u8, depth, rng)
                return state.replace(params=p, opt_state=o,
                                     step=s), metrics
    else:
        state = create_state(cfg, mesh)

    dstep = None
    if cfg.train.distill_from:
        import dataclasses as _dc

        import jax.numpy as jnp

        tcfg = _dc.replace(cfg.model,
                           name=cfg.train.distill_model or cfg.model.name,
                           width_mult=cfg.train.distill_width_mult,
                           quant="none")
        teacher = registry.build(tcfg)
        facade = steplib.TrainState(
            step=jnp.zeros((), jnp.int32),
            params=steplib.init_params(teacher, cfg.data.input_hw, seed=0),
            opt_state=None, tx=None, apply_fn=teacher.apply)
        tckpt = CheckpointManager(cfg.train.distill_from)
        facade, trestored = tckpt.restore_params(facade)
        tckpt.close()
        if trestored is None:
            raise RuntimeError(
                f"no teacher checkpoint in {cfg.train.distill_from!r} "
                f"(distill_model={tcfg.name!r}, width_mult="
                f"{tcfg.width_mult})")
        log.info("distilling from %s step %d (%s, width %g, alpha %g)",
                 cfg.train.distill_from, trestored, tcfg.name,
                 tcfg.width_mult, cfg.train.distill_alpha)
        teacher_params = meshlib.replicate(facade.params, mesh)
        distill_kw = dict(teacher_apply=teacher.apply,
                          input_hw=cfg.data.input_hw,
                          target_hw=resolved_target_hw(cfg),
                          si_lambda=cfg.train.si_lambda,
                          augment=cfg.data.augment,
                          distill_alpha=cfg.train.distill_alpha,
                          ema_decay=cfg.train.ema_decay,
                          loss_kind=cfg.train.loss)

        def dstep(state, img_u8, depth, rng):
            return steplib.distill_train_step(state, teacher_params, img_u8,
                                              depth, rng, **distill_kw)

    ckpt = CheckpointManager(cfg.train.ckpt_dir)
    start_step = 0
    if cfg.train.resume or cfg.train.resume_step is not None:
        state, restored = ckpt.restore(state, step=cfg.train.resume_step)
        if restored is not None:
            start_step = int(state.step)
            log.info("resumed from checkpoint at step %d", start_step)
            if cfg.train.resume_step is not None:
                # Explicit rollback: drop the abandoned newer timeline so
                # this run's saves don't collide with existing steps.
                for s in [s for s in ckpt.all_steps() if s > restored]:
                    log.warning("rollback resume: deleting newer "
                                "checkpoint at step %d", s)
                    ckpt.delete(s)

    # Metrics/TB/viz writers live on process 0 only (multi-host: every
    # process computes identical replicated metrics; one writes).
    writer = MetricsWriter(workdir) if proc0 else None
    progress = progress and proc0
    tb = None
    if cfg.train.tensorboard and proc0:
        from ann3depth_tpu.utils.tb_writer import TensorBoardWriter
        tb = TensorBoardWriter(os.path.join(workdir, "tb"))
    eval_ds = None  # built lazily at the first eval point
    eval_pool = None  # HBM-resident eval pool (cache-device runs)
    sharding = meshlib.batch_sharding(mesh)
    if nproc > 1:
        # multi-process jit rejects process-local arrays; the key must be
        # a global replicated array (parallel/multihost.py).
        from ann3depth_tpu.parallel import multihost
        rng = multihost.replicated_key(cfg.train.seed, mesh)
    else:
        rng = jax.random.key(cfg.train.seed)

    n_steps = cfg.train.steps - start_step
    if spd > 1 and n_steps % spd:
        # cfg.train.steps % spd == 0 is validated up top, so this only
        # trips on a resume from a checkpoint step that isn't block-
        # aligned (e.g. a checkpoint written by a steps_per_dispatch=1
        # run at an odd cadence).
        raise ValueError(
            f"resume step {start_step} leaves {n_steps} steps, not a "
            f"multiple of steps_per_dispatch={spd}; resume from a block-"
            "aligned checkpoint or drop --steps-per-dispatch")
    step_kwargs = dict(input_hw=cfg.data.input_hw,
                       target_hw=resolved_target_hw(cfg),
                       si_lambda=cfg.train.si_lambda, augment=cfg.data.augment,
                       loss_kind=cfg.train.loss,
                       use_pallas=_use_pallas(cfg),
                       # XLA preprocess emits the stem's s2d layout directly
                       # for models that accept it (+~5% step time, encdec).
                       emit_s2d=0 if _use_pallas(cfg)
                       else registry.s2d_input_factor(cfg.model.name),
                       grad_accum=accum, ema_decay=cfg.train.ema_decay)
    if cfg.data.cache_device:
        # (exclusivity with use_grain/multi-dataset validated up top,
        # before the checkpoint manager/writers hold resources)
        if cfg.data.cache_window_mb:
            import json as _json

            from ann3depth_tpu.pipeline import streaming_pool
            window_epochs = cfg.data.window_epochs
            # Calibrated-E sidecar (r5, VERDICT r4 Weak #2): the sampling
            # stream depends on E, and calibration timing is not
            # deterministic — a resumed `auto` run that re-calibrated
            # under different link conditions would silently walk a
            # different index stream. The chosen factor is persisted next
            # to the checkpoints and reused on resume.
            epochs_path = os.path.join(cfg.train.ckpt_dir,
                                       "window_epochs.json")
            persisted = None
            if os.path.exists(epochs_path):
                with open(epochs_path) as f:
                    persisted = _json.load(f)
            if window_epochs == 0:  # --window-epochs auto
                if nproc > 1:
                    raise ValueError(
                        "--window-epochs auto calibrates from process-"
                        "local timings and would diverge across "
                        "controllers; pass an explicit factor under "
                        "--multihost")
                stale = (persisted is not None
                         and persisted.get("cache_window_mb")
                         != cfg.data.cache_window_mb)
                if persisted is not None and start_step > 0 and not stale:
                    window_epochs = int(persisted["window_epochs"])
                    log.info(
                        "--window-epochs auto: reusing echo factor x%d "
                        "calibrated by the original run (persisted in %s)"
                        " — recalibrating mid-run would change the "
                        "sampling stream", window_epochs, epochs_path)
                else:
                    if stale and start_step > 0:
                        log.warning(
                            "--window-epochs auto: persisted factor in %s "
                            "was calibrated for cache_window_mb=%s, this "
                            "run uses %d — recalibrating (the factor is a "
                            "function of the window size; the resumed "
                            "sampling stream changes either way when the "
                            "window changes)", epochs_path,
                            persisted.get("cache_window_mb"),
                            cfg.data.cache_window_mb)
                    # Calibrate with the plain fused step on a throwaway
                    # state, passing the REAL loop's step_kwargs so the
                    # calibration pass compiles the exact program the run
                    # reuses (zero1/distill steps differ by a few percent
                    # — the bias only under-picks E; streaming_pool
                    # docstring).
                    cal = [create_state(cfg, mesh)]

                    def _cal_pass(batches):
                        s, m = cal[0], None
                        for img, dep in batches:
                            s, m = steplib.train_step(s, img, dep, rng,
                                                      **step_kwargs)
                        cal[0] = s  # donation: thread the live buffers
                        float(jax.device_get(m["loss"]))

                    window_epochs = streaming_pool.calibrate_window_epochs(
                        dataset, cfg.train.batch_size, mesh,
                        window_bytes=cfg.data.cache_window_mb << 20,
                        run_pass=_cal_pass, steps_per_dispatch=spd,
                        seed=cfg.train.seed)
                    del cal
                    with open(epochs_path, "w") as f:
                        _json.dump({"window_epochs": window_epochs,
                                    "cache_window_mb":
                                        cfg.data.cache_window_mb,
                                    "calibrated_at_step": start_step}, f)
            elif (persisted is not None and start_step > 0
                    and int(persisted["window_epochs"]) != window_epochs):
                log.warning(
                    "--window-epochs %d overrides the factor x%d the "
                    "original (auto) run calibrated and persisted in %s "
                    "— the resumed sampling stream will differ from the "
                    "one the run would have continued",
                    window_epochs, int(persisted["window_epochs"]),
                    epochs_path)
            feed = streaming_pool.StreamingPoolSampler(
                dataset, cfg.train.batch_size, mesh,
                window_bytes=cfg.data.cache_window_mb << 20,
                window_epochs=window_epochs, steps=n_steps,
                seed=cfg.train.seed + start_step)
        else:
            from ann3depth_tpu.pipeline.device_cache import (
                DevicePoolSampler)
            feed = DevicePoolSampler(dataset, cfg.train.batch_size, mesh,
                                     steps=n_steps,
                                     seed=cfg.train.seed + start_step)
    elif cfg.data.use_grain:
        from ann3depth_tpu.pipeline.grain_loader import grain_batches
        # feed_batch_size: under multi-host, grain shuffles/batches this
        # process's shard; DeviceFeed assembles the global batch.
        if extra_datasets:
            # Multi-dataset x grain: round-robin whole batches from one
            # grain pipeline per source (same alignment contract as
            # interleave_batches — steps bounds each pipeline, so the
            # rotation never skips an exhausted source).
            from ann3depth_tpu.data.batching import round_robin
            host_iter = round_robin(
                [grain_batches(d, feed_batch_size, steps=n_steps,
                               seed=cfg.train.seed + start_step + 17 * k,
                               num_workers=cfg.data.num_workers)
                 for k, d in enumerate([dataset, *extra_datasets])],
                steps=n_steps)
        else:
            host_iter = grain_batches(dataset, feed_batch_size,
                                      steps=n_steps,
                                      seed=cfg.train.seed + start_step,
                                      num_workers=cfg.data.num_workers)
    elif extra_datasets:
        # Multi-dataset training: round-robin whole batches (each batch is
        # shape-uniform; the jitted step compiles once per source shape).
        # Under multi-host every process round-robins the same source
        # order (steps bounds every per-source iterator, so none exhausts
        # and the rotation stays aligned across processes).
        from ann3depth_tpu.data.batching import interleave_batches
        host_iter = interleave_batches([dataset, *extra_datasets],
                                       feed_batch_size, steps=n_steps,
                                       seed=cfg.train.seed + start_step)
    else:
        host_iter = dataset.batches(feed_batch_size, steps=n_steps,
                                    seed=cfg.train.seed + start_step)
    if not cfg.data.cache_device:
        feed = DeviceFeed(host_iter, sharding=sharding,
                          prefetch=cfg.data.prefetch)

    # XLA:CPU's in-process collective rendezvous can starve when many
    # async-dispatched steps are in flight on a host with few cores (each
    # waiting participant blocks a pool thread; rendezvous.cc aborts after
    # its 40 s termination timeout — reproduced at 50+ in-flight steps on
    # this 1-core machine). Lockstep dispatch on the CPU backend only; the
    # TPU path keeps the fully async pipeline.
    cpu_lockstep = jax.default_backend() == "cpu" and mesh.devices.size > 1

    run_block = None
    if spd > 1:
        # Scanned K-step driver: the benchmarks' scan-of-K promoted to the
        # real loop. One program advances `spd` steps over the HBM pool —
        # the gather, preprocess, fwd/bwd, and update all fuse behind a
        # single dispatch; the per-step rng stays deterministic because
        # every step fn folds the key with state.step (train/step.py).
        import functools

        gather = feed.gather_fn

        def _inner(st, im, de, r):
            if zstep is not None:
                return zstep(st, im, de, r)
            if dstep is not None:
                return dstep(st, im, de, r)
            # __wrapped__: trace the plain fn — nesting the jitted wrapper
            # inside the scan would only add donation warnings (same
            # pattern as benchmarks/bench_train.py's scan-of-K).
            return steplib.train_step.__wrapped__(st, im, de, r,
                                                  **step_kwargs)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_block(state, pool_img, pool_dep, idx_block, rng):
            def body(st, idx):
                im, de = gather(pool_img, pool_dep, idx)
                return _inner(st, im, de, rng)

            state, ms = jax.lax.scan(body, state, idx_block)
            # block-boundary metrics = the LAST step's (what per-step
            # logging at this cadence would have reported)
            return state, jax.tree.map(lambda x: x[-1], ms)

    # Profiler window: skip compile + a few warm steps, then trace
    # cfg.train.profile_steps of the steady-state hot loop. Units are
    # DISPATCHES: with steps_per_dispatch>1 each traced unit is one
    # K-step block program.
    n_iters = n_steps // spd
    prof_start = prof_stop = -1
    if cfg.train.profile_dir:
        prof_start = min(5 if spd == 1 else 1, max(0, n_iters - 1))
        prof_stop = min(
            prof_start + max(1, -(-cfg.train.profile_steps // spd)), n_iters)

    metrics = {}
    t0 = time.perf_counter()
    imgs_since = 0
    profiling = False
    best_eval_rmse, evals_stale = float("inf"), 0
    best_snapshot = None  # (step, host params) at the best eval so far
    best_ckpt = best_metric_path = None
    if cfg.train.save_best:
        import json as _json

        # A second one-slot manager under <ckpt_dir>/best; the sibling
        # best_metric.json pins the RMSE the retained step scored so a
        # RESUMED run only overwrites it with a genuine improvement
        # (best_eval_rmse otherwise restarts at inf).
        best_ckpt = CheckpointManager(
            os.path.join(cfg.train.ckpt_dir, "best"), max_to_keep=1)
        best_metric_path = os.path.join(cfg.train.ckpt_dir,
                                        "best_metric.json")
        if os.path.exists(best_metric_path):
            with open(best_metric_path) as f:
                prior = _json.load(f)
            best_eval_rmse = min(best_eval_rmse, float(prior["rmse"]))
            log.info("save_best: resuming against prior best rmse %.4f "
                     "(step %d)", prior["rmse"], prior["step"])
    # Best-weights capture needs a host copy of the params; with TP or
    # multi-host sharding the local process may not hold every shard, so
    # those runs keep the stop-step weights instead (logged at stop).
    can_capture_best = (cfg.train.early_stop_patience > 0
                        and tp == 1 and nproc == 1)
    try:
        iterator = feed.index_blocks(spd) if run_block is not None else feed
        for i, item in enumerate(iterator):
            if i == prof_start:
                jax.block_until_ready(metrics.get("loss", ()))  # drain warmup
                jax.profiler.start_trace(cfg.train.profile_dir)
                profiling = True
            if run_block is not None:
                state, metrics = run_block(state, feed.pool_img,
                                           feed.pool_dep, item, rng)
                step_no = start_step + (i + 1) * spd - 1
                imgs_since += spd * cfg.train.batch_size
            else:
                img_u8, depth = item
                step_no = start_step + i
                if zstep is not None:
                    state, metrics = zstep(state, img_u8, depth, rng)
                elif dstep is not None:
                    state, metrics = dstep(state, img_u8, depth, rng)
                else:
                    state, metrics = steplib.train_step(
                        state, img_u8, depth, rng, **step_kwargs)
                imgs_since += int(img_u8.shape[0])
            if cpu_lockstep:
                jax.block_until_ready(metrics["loss"])
            if i + 1 == prof_stop and profiling:
                jax.block_until_ready(metrics["loss"])  # capture device work
                jax.profiler.stop_trace()
                profiling = False
                log.info("profiler trace (%d dispatches) -> %s",
                         prof_stop - prof_start, cfg.train.profile_dir)
            is_last = i == n_iters - 1

            if (cfg.train.log_every
                    and (step_no + 1) % cfg.train.log_every == 0) or is_last:
                metrics = jax.device_get(metrics)  # sync point
                if not np.isfinite(metrics["loss"]):
                    raise FloatingPointError(
                        f"non-finite loss {metrics['loss']} at step "
                        f"{step_no + 1} (grad_norm="
                        f"{metrics.get('grad_norm')}); last good checkpoint "
                        f"is in {cfg.train.ckpt_dir} — lower the learning "
                        "rate or inspect the data batch")
                dt = time.perf_counter() - t0
                ips = imgs_since / dt if dt > 0 else 0.0
                if writer is not None:
                    writer.write(step_no + 1, metrics, images_per_sec=ips)
                if tb is not None:
                    tb.write_scalars(step_no + 1,
                                     {**metrics, "images_per_sec": ips})
                if progress:
                    log.info("step %d loss=%.4f rmse=%.3f %.1f img/s",
                             step_no + 1, metrics["loss"], metrics["rmse"], ips)
                t0, imgs_since = time.perf_counter(), 0

            if cfg.train.eval_every and (step_no + 1) % cfg.train.eval_every == 0:
                if eval_ds is None:
                    eval_ds = build_dataset(cfg, "test")
                    if cfg.data.cache_device:
                        # cache-device runs score the in-loop sample from
                        # an HBM-resident EVAL pool too: staged once, zero
                        # H2D per eval (the convergence-study recipe,
                        # promoted). Tiny/indivisible splits fall back to
                        # the host feed with a note.
                        from ann3depth_tpu.pipeline.device_cache import (
                            DEFAULT_BYTE_BUDGET, DevicePoolSampler)
                        try:
                            # The train pool is already resident: the eval
                            # pool gets the REMAINING budget, not a fresh
                            # 8 GB (combined residency is what OOMs).
                            eval_pool = DevicePoolSampler(
                                eval_ds, cfg.train.batch_size, mesh,
                                steps=0, seed=cfg.train.seed,
                                byte_budget=max(
                                    0, DEFAULT_BYTE_BUDGET
                                    - getattr(feed, "nbytes", 0)))
                            # size check only — no throwaway gathers
                            if 4 * eval_pool.per_dev > eval_pool.shard:
                                eval_pool.close()
                                raise ValueError(
                                    f"eval split too small for a 4-batch "
                                    f"fixed sample at batch_size="
                                    f"{cfg.train.batch_size}")
                        except ValueError as e:
                            log.info("in-loop eval uses the host feed "
                                     "(%s)", e)
                            eval_pool = None
                # In-loop eval is a SAMPLE (4 batches), not the full split;
                # eval_batches in the record keeps it distinguishable from
                # the CLI's full-split numbers in convergence studies.
                # stage_pool=False: THIS loop owns pooling; when eval_pool
                # is None the fallback must be the host feed, not a fresh
                # full-split staging inside evaluate() at every eval point.
                em = evaluate(cfg, state=state, dataset=eval_ds,
                              max_batches=4, mesh=mesh, stage_pool=False,
                              device_batches=(eval_pool.fixed_batches(4)
                                              if eval_pool else None))
                if writer is not None:
                    writer.write(step_no + 1,
                                 {**{f"eval_{k}": v for k, v in em.items()},
                                  "eval_batches": 4})
                if tb is not None:
                    tb.write_scalars(step_no + 1,
                                     {f"eval/{k}": v for k, v in em.items()})
                if nproc == 1:
                    # viz runs eager multi-device programs; on multi-host
                    # that would need all-process lockstep for a debug
                    # image — reconstruct from checkpoints instead.
                    _write_viz(cfg, state, eval_ds, workdir, step_no + 1, tb)
                if progress:
                    log.info("eval @%d rmse=%.3f abs_rel=%.3f", step_no + 1,
                             em["rmse"], em["abs_rel"])
                if cfg.train.early_stop_patience or best_ckpt is not None:
                    # em is a deterministic finalize of collectively-
                    # reduced stats, so every process sees the same
                    # number and stops at the same step.
                    if em["rmse"] < (best_eval_rmse
                                     - cfg.train.early_stop_min_delta):
                        best_eval_rmse, evals_stale = em["rmse"], 0
                        if can_capture_best:
                            best_snapshot = (step_no + 1, jax.tree.map(
                                np.asarray, state.params))
                        if best_ckpt is not None:
                            import json as _json

                            best_ckpt.save(step_no + 1, state)
                            if proc0:
                                with open(best_metric_path, "w") as f:
                                    _json.dump({"rmse": float(em["rmse"]),
                                                "step": step_no + 1}, f)
                    else:
                        evals_stale += 1
                        if (cfg.train.early_stop_patience
                                and evals_stale
                                >= cfg.train.early_stop_patience):
                            if best_snapshot is not None:
                                # Keras restore_best_weights semantics:
                                # the stop-step checkpoint/state carries
                                # the best-eval params (the weights the
                                # feature exists to keep), not the stale
                                # ones the stop was triggered on.
                                bstep, bparams = best_snapshot
                                state = state.replace(
                                    params=meshlib.replicate(bparams, mesh))
                                log.info(
                                    "early stop at step %d: restored the "
                                    "best weights (eval rmse %.4f at step "
                                    "%d); %d stale evals",
                                    step_no + 1, best_eval_rmse, bstep,
                                    evals_stale)
                            else:
                                log.info(
                                    "early stop at step %d: eval rmse "
                                    "stuck at %.4f (best %.4f) for %d "
                                    "evals (sharded run: stop-step "
                                    "weights kept)",
                                    step_no + 1, em["rmse"],
                                    best_eval_rmse, evals_stale)
                            ckpt.save(step_no + 1, state)
                            break
                t0, imgs_since = time.perf_counter(), 0

            if (cfg.train.checkpoint_every
                    and (step_no + 1) % cfg.train.checkpoint_every == 0
                    ) or is_last:
                ckpt.save(step_no + 1, state)
    finally:
        if profiling:  # loop exited inside the trace window
            jax.profiler.stop_trace()
        if eval_pool is not None:
            eval_pool.close()
        feed.close()
        ckpt.wait()
        ckpt.close()
        if best_ckpt is not None:
            best_ckpt.wait()
            best_ckpt.close()
        if writer is not None:
            writer.close()
        if tb is not None:
            tb.close()
    return state, metrics


def predict_batch(cfg: Config, state, img_u8, depth):
    """(normalized imgs, resized depth, linear pred) for viz/eval tooling."""
    from ann3depth_tpu.pipeline import preprocess

    images, depths = preprocess.preprocess_batch(
        img_u8, depth, cfg.data.input_hw, resolved_target_hw(cfg), key=None)
    pred_log = state.apply_fn({"params": state.params}, images)
    return images, depths, np.exp(np.asarray(pred_log[..., 0]))


def _write_viz(cfg: Config, state, dataset, workdir, step, tb=None):
    """Render an (rgb | gt | pred) triple grid from the eval split."""
    from ann3depth_tpu.utils import viz

    img_u8, depth = next(dataset.batches(min(4, cfg.train.batch_size),
                                         steps=1, shuffle=False))
    images, depths, pred = predict_batch(cfg, state, img_u8, depth)
    return viz.write_triple_summary(workdir, step, jax.device_get(images),
                                    jax.device_get(depths), pred, tb)


def evaluate(cfg: Config, state=None, dataset=None, max_batches=None,
             mesh=None, use_ema=False, report_dir=None, report_worst=8,
             ckpt_step=None, tta="", avg_last=None, align="", crop="",
             device_batches=None, stage_pool=True):
    """Eval loop: accumulate global sufficient statistics over the test
    split, finalize once [B:2]. Dataset RMSE is sqrt of the mean squared
    error over ALL valid pixels (reference_spec.EVAL_ACCUMULATION); the
    loss stays the mean over images of the per-image Eigen loss.

    Data-parallel like training: batches are sharded over the mesh's
    "data" axis (auto mesh capped to a divisor of the batch size, same
    policy as train); the stats reduction psums over ICI.

    align="median": per-image median scale alignment of the prediction
    before metrics (step.apply_alignment — the scale-ambiguous eval
    protocol); applies to both the stats and the report path.

    crop="eigen"|"garg": restrict metrics to the literature's fractional
    eval crop (reference_spec.EVAL_CROPS; losses.eval_crop_mask). Composes
    with tta and align (the median window is the cropped region).

    report_dir: also write per-image error attribution — per_image.jsonl
    (one metrics row per test image, split order), worst.png (a
    rgb|gt|pred triple grid of the report_worst highest-RMSE images) and
    summary.json. The dataset metrics come from the same per-image
    sufficient statistics (their sums equal the global sums), so the
    report adds one D2H of per-image stats per batch, not a second pass.

    Note on --use-grain configs: eval always iterates dataset.batches
    directly (shuffle=False, deterministic split order) — grain and its
    num_workers apply to the TRAINING feed only. The numbers are
    identical either way (same decode, same order); grain's worker
    processes only buy overlap for the shuffled steady-state train loop,
    which a sequential one-pass eval doesn't have.

    device_batches: an iterable of (img_u8, depth) arrays ALREADY on
    device (e.g. DevicePoolSampler.fixed_batches) — skips the host feed
    and its H2D entirely; the in-loop eval of a --cache-device run uses
    this to score from an HBM-resident eval pool. Exclusive with
    report_dir (the report ranks the full split in split order).

    cfg.data.cache_device (CLI `eval --cache-device`): stages the test
    split into HBM once and evaluates from the pool — one H2D of the raw
    split instead of one per batch (through this environment's tunnel:
    the 134-image Make3D eval drops from minutes of per-batch transfers
    to one staging pass). Metrics are order-invariant global sums, so
    the pool's per-shard iteration changes nothing on one device; on a
    multi-device mesh the remainder trim is per-shard rather than
    global-tail (same dropped count, different examples — noted here,
    not silent). Skipped under report_dir / multihost / tiny splits
    (loud log), where the host path runs instead."""
    from ann3depth_tpu.train import losses

    dataset = dataset or build_dataset(cfg, "test")
    nproc = jax.process_count()
    if report_dir is not None and nproc > 1:
        raise ValueError("eval report is single-process only (the full "
                         "split must rank in one place); run eval without "
                         "--multihost")
    if device_batches is not None and report_dir is not None:
        raise ValueError("device_batches is a fixed pool sample; the "
                         "report path needs the full split in split order")
    if mesh is None:
        mesh = meshlib.auto_data_mesh(cfg.train.batch_size)
    sharding = meshlib.batch_sharding(mesh)
    eval_batch_size = cfg.train.batch_size
    if nproc > 1:
        # Each process streams its strided shard; every process must run
        # the SAME number of collective eval steps, so bound by the
        # smallest shard (= len//nproc examples).
        from ann3depth_tpu.data.batching import ProcessShardView
        if cfg.train.batch_size % nproc:
            raise ValueError(
                f"batch_size={cfg.train.batch_size} not divisible by "
                f"{nproc} processes")
        eval_batch_size = cfg.train.batch_size // nproc
        common = (len(dataset) // nproc) // eval_batch_size
        max_batches = common if max_batches is None else min(max_batches,
                                                             common)
        dataset = ProcessShardView(dataset, jax.process_index(), nproc)
    if state is None:
        state = create_state(cfg, mesh)
        ckpt = CheckpointManager(cfg.train.ckpt_dir)
        # params-only restore: works for checkpoints from any trainer
        # (replicated Adam or --zero1's sharded opt layout); use_ema scores
        # the Polyak-averaged weights instead
        if avg_last:
            if ckpt_step is not None:
                raise ValueError("avg_last and ckpt_step are exclusive "
                                 "(the average spans the last k saves)")
            state, restored = ckpt.restore_avg_params(state, avg_last,
                                                      use_ema=use_ema)
        else:
            state, restored = ckpt.restore_params(state, use_ema=use_ema,
                                                  step=ckpt_step)
        ckpt.close()
        if restored is None:
            raise RuntimeError(f"no checkpoint in {cfg.train.ckpt_dir}")
        # restore_params yields host arrays; place them on THIS eval mesh
        # (the trainer's mesh may differ, e.g. under --grad-accum, and
        # multi-host jit rejects process-local arrays).
        state = state.replace(params=meshlib.replicate(state.params, mesh))

    # Accumulate stats as DEVICE scalars (adds dispatch async, overlapping
    # the next batch's step) and fetch once at the end: one host<->device
    # sync per eval, not per batch — through this environment's tunnel a
    # per-batch device_get costs ~25 ms.
    step_kw = dict(input_hw=cfg.data.input_hw,
                   target_hw=resolved_target_hw(cfg),
                   si_lambda=cfg.train.si_lambda,
                   use_pallas=_use_pallas(cfg), loss_kind=cfg.train.loss,
                   tta=tta, align=align, crop=crop)
    own_pool = None
    if device_batches is None and cfg.data.cache_device and stage_pool:
        if report_dir is not None or nproc > 1:
            log.info("eval --cache-device skipped: %s needs the host feed "
                     "(full split in split order / per-process shards)",
                     "report_dir" if report_dir is not None else "multihost")
        else:
            from ann3depth_tpu.pipeline.device_cache import DevicePoolSampler
            try:
                own_pool = DevicePoolSampler(dataset, eval_batch_size, mesh,
                                             steps=0, seed=0)
                n_b = own_pool.shard // own_pool.per_dev
                if max_batches is not None:
                    n_b = min(n_b, max_batches)
                device_batches = own_pool.fixed_batches(n_b)
            except ValueError as e:
                log.info("eval uses the host feed (%s)", e)
                own_pool = None

    totals = {}
    rows, worst = [], []  # report mode: per-image rows + worst-K heap
    if device_batches is not None:
        batch_iter = ((img, dep, True) for img, dep in device_batches)
    else:
        batch_iter = ((img, dep, False) for img, dep in
                      dataset.batches(eval_batch_size, steps=max_batches,
                                      shuffle=False))
    for b, (img_u8, depth, on_device) in enumerate(batch_iter):
        if on_device:
            pass  # already placed (and globally sharded) by the pool
        elif nproc > 1:
            from ann3depth_tpu.parallel import multihost
            img_u8, depth = multihost.global_batch_from_local(
                (img_u8, depth), sharding)
        else:
            img_u8, depth = (jax.device_put(img_u8, sharding),
                             jax.device_put(depth, sharding))
        if report_dir is None:
            stats = steplib.eval_stats_step(state, img_u8, depth, **step_kw)
            if jax.default_backend() == "cpu":
                # same CPU rendezvous-starvation guard as the train loop
                jax.block_until_ready(stats)
            for k, v in stats.items():
                totals[k] = totals[k] + v if k in totals else v
        else:
            import heapq

            per, images, depths, pred_log = steplib.eval_report_step(
                state, img_u8, depth, **step_kw)
            per = {k: np.asarray(v) for k, v in jax.device_get(per).items()}
            bsz = per["n_valid"].shape[0]
            batch_tot = {k: float(v.sum()) for k, v in per.items()
                         if k != "si_loss"}
            batch_tot["n_images"] = float(bsz)
            batch_tot["sum_si_loss"] = float(per["si_loss"].sum())
            for k, v in batch_tot.items():
                totals[k] = totals.get(k, 0.0) + v
            fin = losses.finalize_depth_metrics(
                {**{k: v for k, v in per.items() if k != "si_loss"},
                 "sum_si_loss": per["si_loss"],
                 "n_images": np.ones(bsz, np.float32)})
            for i in range(bsz):
                idx = b * eval_batch_size + i
                rows.append({"index": idx,
                             **{k: float(v[i]) for k, v in fin.items()}})
                r = float(fin["rmse"][i])
                if report_worst > 0 and (len(worst) < report_worst
                                         or r > worst[0][0]):
                    # fetch only candidate images (slicing a device array
                    # transfers just the slice)
                    payload = (np.asarray(images[i]), np.asarray(depths[i]),
                               np.exp(np.asarray(pred_log[i])[..., 0]))
                    heapq.heappush(worst, (r, idx, payload))
                    if len(worst) > report_worst:
                        heapq.heappop(worst)
        if max_batches is not None and b + 1 >= max_batches:
            break
    if not totals:
        raise ValueError("eval split yielded no batches")
    totals = {k: float(v) for k, v in jax.device_get(totals).items()}
    if own_pool is not None:
        own_pool.close()
    metrics = losses.finalize_depth_metrics(totals)
    if report_dir is not None:
        _write_eval_report(report_dir, rows, worst, metrics)
    return metrics


def restore_state_for_eval(cfg: Config, use_ema=False, ckpt_step=None,
                           avg_last=None):
    """Build a state and restore params ONCE for eval-family consumers
    (shared by multi-dataset and multi-protocol eval so N scorings don't
    redo model init + orbax deserialize + param H2D N times)."""
    state = create_state(cfg)
    ckpt = CheckpointManager(cfg.train.ckpt_dir)
    try:
        if avg_last:
            if ckpt_step is not None:
                raise ValueError("avg_last and ckpt_step are exclusive "
                                 "(the average spans the last k saves)")
            state, restored = ckpt.restore_avg_params(state, avg_last,
                                                      use_ema=use_ema)
        else:
            state, restored = ckpt.restore_params(state, use_ema=use_ema,
                                                  step=ckpt_step)
    finally:
        ckpt.close()
    if restored is None:
        raise RuntimeError(f"no checkpoint in {cfg.train.ckpt_dir}")
    return state


def evaluate_protocols(cfg: Config, protocols, *, state=None, use_ema=False,
                       ckpt_step=None, avg_last=None, max_batches=None,
                       tta="flip", align="median", crop="eigen",
                       dataset=None, mesh=None):
    """Score several eval-protocol variants in ONE invocation, sharing the
    restored checkpoint and (cache-device runs) ONE staged test pool
    across all of them (r5: the NYU lever study paid a 1.56 GB test-pool
    staging per `eval` invocation through the tunnel — three protocol
    variants cost three stagings; this costs one).

    protocols: tokens — 'plain', or '+'-joined subsets of
    {'tta','align','crop'} (e.g. 'tta', 'tta+align+crop'); the
    tta/align/crop arguments supply each component's value when present.
    Returns {token: metrics dict}. Single-process; report_dir is not
    supported (one report per variant would be ambiguous — run a plain
    `eval --report-dir` for attribution)."""
    if jax.process_count() > 1:
        raise ValueError("evaluate_protocols is single-process (its point "
                         "is staging the pool once; use plain evaluate "
                         "under --multihost)")
    if not protocols:
        raise ValueError("protocols must be a non-empty list of tokens")
    parsed = {}
    for token in protocols:
        parts = frozenset() if token == "plain" else frozenset(
            token.split("+"))
        unknown = parts - {"tta", "align", "crop"}
        if unknown:
            raise ValueError(
                f"unknown protocol component(s) {sorted(unknown)} in "
                f"{token!r}; tokens are 'plain' or '+'-joined subsets of "
                "tta|align|crop")
        parsed[token] = parts
    dataset = dataset or build_dataset(cfg, "test")
    if mesh is None:
        mesh = meshlib.auto_data_mesh(cfg.train.batch_size)
    if state is None:
        state = restore_state_for_eval(cfg, use_ema=use_ema,
                                       ckpt_step=ckpt_step,
                                       avg_last=avg_last)
    pool = n_b = None
    if cfg.data.cache_device:
        from ann3depth_tpu.pipeline.device_cache import DevicePoolSampler
        try:
            pool = DevicePoolSampler(dataset, cfg.train.batch_size, mesh,
                                     steps=0, seed=0)
            n_b = pool.shard // pool.per_dev
            if max_batches is not None:
                n_b = min(n_b, max_batches)
        except ValueError as e:
            log.info("protocol eval uses the host feed (%s)", e)
            pool = None
    try:
        out = {}
        for token, parts in parsed.items():
            out[token] = evaluate(
                cfg, state=state, dataset=dataset, max_batches=max_batches,
                mesh=mesh, stage_pool=False,
                tta=tta if "tta" in parts else "",
                align=align if "align" in parts else "",
                crop=crop if "crop" in parts else "",
                device_batches=(pool.fixed_batches(n_b) if pool else None))
    finally:
        if pool is not None:
            pool.close()
    return out


def _write_eval_report(report_dir, rows, worst, metrics):
    """per_image.jsonl + worst.png triple grid + summary.json."""
    import json

    from ann3depth_tpu.utils import viz

    os.makedirs(report_dir, exist_ok=True)
    with open(os.path.join(report_dir, "per_image.jsonl"), "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    ranked = sorted(worst, key=lambda t: -t[0])  # worst first
    if ranked:
        imgs = np.stack([p[0] for _, _, p in ranked])
        gts = np.stack([p[1] for _, _, p in ranked])
        preds = np.stack([p[2] for _, _, p in ranked])
        grid = viz.triple_grid(imgs, gts, preds, max_rows=len(ranked))
        viz.save_png(os.path.join(report_dir, "worst.png"), grid)
    with open(os.path.join(report_dir, "summary.json"), "w") as f:
        json.dump({"metrics": metrics, "images": len(rows),
                   "worst": [{"index": idx, "rmse": r}
                             for r, idx, _ in ranked]}, f, indent=2)
    log.info("eval report: %d images -> %s (worst %d rendered)",
             len(rows), report_dir, len(ranked))
