"""Jitted train/eval steps — the per-step device work (SURVEY.md §3.3).

One `train_step` = fused preprocess + forward + backward + optimizer update,
compiled by XLA into a single TPU program per step (the reference's
session.run equivalent, minus the host ping-pong).

TPU-first choices:
- The *whole* step, including uint8->normalized preprocess and augmentation,
  runs on device: the host only ships raw uint8 frames (4x less H2D traffic
  than f32).
- Buffer donation on state: params/opt-state are updated in place in HBM.
- DP: inputs carry a NamedSharding over the "data" mesh axis; jit's sharding
  propagation inserts the psum gradient all-reduce over ICI [B:5]. There is
  no pmap and no hand-written collective.
- Loss reductions in f32 even when compute is bf16 (losses.py).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ann3depth_tpu.pipeline import preprocess
from ann3depth_tpu.train import losses


class TrainState(struct.PyTreeNode):
    """Minimal functional train state (params + opt state + step).

    ema_params (optional): exponential moving average of params, updated
    inside the jitted step when the loop enables it (TrainConfig.ema_decay
    > 0). None (the default) keeps the pytree shape of ema-less
    checkpoints unchanged.
    """

    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)
    ema_params: Any = None

    @classmethod
    def create(cls, apply_fn, params, tx, ema: bool = False):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx, apply_fn=apply_fn,
                   ema_params=jax.tree.map(jnp.copy, params) if ema else None)


def make_schedule(learning_rate, warmup_steps=0, total_steps=None,
                  schedule="cosine"):
    """Learning-rate schedule; shared by the replicated optimizer below
    and the ZeRO-1 path (parallel/zero1.py) so --zero1 trains the same.

    schedule="cosine" (default): linear warmup then cosine decay over
    total_steps (warmup_steps=0 disables only the warmup — never the
    decay). total_steps None -> constant lr (tests/benches).
    schedule="constant": fixed lr, with linear warmup if warmup_steps>0
    (the TF1-era reference regime — a flat Adam learning rate)."""
    if schedule == "constant":
        if warmup_steps:
            return optax.schedules.warmup_constant_schedule(
                0.0, learning_rate, warmup_steps)
        return learning_rate
    if schedule != "cosine":
        raise ValueError(f"unknown schedule {schedule!r}; "
                         "have cosine | constant")
    if total_steps:
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1))
    return learning_rate


def make_inner_optimizer(sched, optimizer="adamw", b1=0.9, b2=0.999,
                         weight_decay=0.0):
    """The clip-free update rule — shared by make_optimizer (which wraps
    it in the global-norm clip) and the ZeRO-1 path (which clips
    explicitly from a psum'd norm and runs this on flat 1/N chunks —
    exact for any elementwise rule, which all of these are).

    adamw: decoupled weight decay (the default). adam: weight_decay
    folded out (plain Adam). sgd: momentum = b1, weight decay via
    additive l2 (classic)."""
    if optimizer == "adamw":
        return optax.adamw(sched, b1=b1, b2=b2, weight_decay=weight_decay)
    if optimizer == "adam":
        if weight_decay:
            raise ValueError(
                "--optimizer adam ignores weight decay (plain Adam has "
                f"none); got weight_decay={weight_decay}. Use adamw for "
                "decoupled decay or sgd for additive L2, or pass "
                "--weight-decay 0.")
        return optax.adam(sched, b1=b1, b2=b2)
    if optimizer == "sgd":
        tx = optax.sgd(sched, momentum=b1 if b1 > 0 else None)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
        return tx
    raise ValueError(f"unknown optimizer {optimizer!r}; "
                     "have adamw | adam | sgd")


def make_optimizer(learning_rate, warmup_steps=0, total_steps=None,
                   b1=0.9, b2=0.999, weight_decay=0.0, clip_norm=1.0,
                   optimizer="adamw", schedule="cosine"):
    """Configured update rule with linear warmup + cosine decay;
    global-norm clipped.

    clip_norm <= 0 disables clipping (the usual convention) — a literal
    clip-to-0 would silently zero every update and freeze training."""
    sched = make_schedule(learning_rate, warmup_steps, total_steps,
                          schedule)
    clip = (optax.clip_by_global_norm(clip_norm) if clip_norm > 0
            else optax.identity())
    return optax.chain(
        clip,
        make_inner_optimizer(sched, optimizer, b1=b1, b2=b2,
                             weight_decay=weight_decay),
    )


def loss_fn(params, apply_fn, images, depths, si_lambda, loss_kind="si"):
    """images: [B,h,w,3] normalized f32; depths: [B,h',w'] linear meters.

    loss_kind: "si" (Eigen eq. 4, the default), "l2" (linear-depth MSE),
    "berhu" (reverse Huber) — losses.depth_loss."""
    pred_log = apply_fn({"params": params}, images)
    loss = losses.depth_loss(pred_log, depths, kind=loss_kind,
                             lam=si_lambda)
    return loss, pred_log


def _to_microbatches(x, accum):
    """[A*m, ...] -> [A, m, ...] with microbatch j = x[j::accum].

    Interleaved (strided) split, not contiguous blocks: under DP sharding
    of the global batch axis each device's shard contributes m/n contiguous
    rows to EVERY microbatch, so the reshape+swap stays device-local (no
    resharding collective). A contiguous split would put whole microbatches
    on device subsets and force an all-to-all per step.
    """
    m = x.shape[0] // accum
    x = x.reshape(m, accum, *x.shape[1:])
    return jnp.swapaxes(x, 0, 1)


def ema_update(ema, new_params, ema_decay):
    """One Polyak-averaging step (shared with parallel/zero1.py)."""
    return jax.tree.map(lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                        ema, new_params)


def _ema_update(state, new_params, ema_decay):
    """EMA of params after the optimizer step (no-op when disabled)."""
    if state.ema_params is None or not ema_decay:
        return state.ema_params
    return ema_update(state.ema_params, new_params, ema_decay)


def accumulate_microbatches(one, img_u8, depth_raw, *, grad_accum, augment,
                            base_key, grads_like, stats_fn, target_hw):
    """Scan `grad_accum` interleaved microbatches through
    `one(img, dep, key) -> (grads, stats)`, summing both carries.

    Returns (mean grads, summed stats). Shared by the replicated accum
    step below and the ZeRO-1 accum path (parallel/zero1.py) so the
    zero-carry shape recipe and the per-microbatch key scheme cannot
    diverge between the two trainers."""
    m = img_u8.shape[0] // grad_accum
    imgs = _to_microbatches(img_u8, grad_accum)
    deps = _to_microbatches(depth_raw, grad_accum)
    zero_grads = jax.tree.map(lambda p: jnp.zeros(p.shape, p.dtype),
                              grads_like)
    # Stats carry structure from an abstract eval of one microbatch's stats
    # (all f32 scalars).
    zero_stats = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(stats_fn,
                       jax.ShapeDtypeStruct((m, *target_hw, 1), jnp.float32),
                       jax.ShapeDtypeStruct((m, *target_hw), jnp.float32)))

    def micro(carry, xs):
        gacc, sacc = carry
        img, dep, idx = xs
        key = jax.random.fold_in(base_key, idx) if augment else None
        grads, stats = one(img, dep, key)
        return (jax.tree.map(jnp.add, gacc, grads),
                jax.tree.map(jnp.add, sacc, stats)), None

    (gacc, stats), _ = jax.lax.scan(
        micro, (zero_grads, zero_stats),
        (imgs, deps, jnp.arange(grad_accum)))
    return jax.tree.map(lambda g: g / grad_accum, gacc), stats


@functools.partial(
    jax.jit,
    static_argnames=("input_hw", "target_hw", "si_lambda", "augment",
                     "use_pallas", "resize_precision", "emit_s2d",
                     "grad_accum", "ema_decay", "loss_kind"),
    donate_argnames=("state",),
)
def train_step(state: TrainState, img_u8, depth_raw, rng, *,
               input_hw, target_hw, si_lambda=0.5, augment=False,
               use_pallas=False, resize_precision="default", emit_s2d=0,
               grad_accum=1, ema_decay=0.0, loss_kind="si"):
    """One fused device step: preprocess -> fwd -> bwd -> update.

    img_u8:    [B, H, W, 3] raw uint8 frames (any source size)
    depth_raw: [B, dh, dw] raw f32 depth (any source grid)
    rng:       PRNG key for augmentation (folded with step for determinism)
    use_pallas: run the fused Pallas preprocess kernel (TPU) instead of the
      XLA oracle path (same math; ops/pallas_preprocess.py).
    resize_precision: "default" (prod: the model computes in bf16, exact-f32
      resize is wasted MXU passes — ~11% of the step, BASELINE.md) or
      "highest" (exact f32; the DP-vs-single-device equality tests need it
      because truncated-f32 dots tile differently under partitioning).
    emit_s2d: nonzero -> the XLA preprocess emits the pre-space-to-depth
      bf16 layout the encdec stem consumes directly (no relayout copies;
      pipeline/preprocess.preprocess_batch). encdec-family models only.
    grad_accum: >1 -> one optimizer update from `grad_accum` sequential
      microbatches of B/grad_accum images, still ONE XLA program: a
      lax.scan accumulates mean gradients and metric sufficient statistics,
      then the update runs once. Peak activation memory is that of a
      microbatch, so effective batches beyond HBM capacity train without
      host round-trips. Equal (up to f32 reassociation) to a single
      full-batch step; metrics are exact full-batch values (stats are
      summed across microbatches and finalized once).
    """
    prec = (jax.lax.Precision.HIGHEST if resize_precision == "highest"
            else jax.lax.Precision.DEFAULT)
    if grad_accum > 1:
        return _train_step_accum(
            state, img_u8, depth_raw, rng, input_hw=input_hw,
            target_hw=target_hw, si_lambda=si_lambda, augment=augment,
            use_pallas=use_pallas, prec=prec, emit_s2d=emit_s2d,
            grad_accum=grad_accum, ema_decay=ema_decay,
            loss_kind=loss_kind)
    key = jax.random.fold_in(rng, state.step) if augment else None
    images, depths = preprocess.preprocess_batch(
        img_u8, depth_raw, input_hw, target_hw, key=key,
        use_pallas=use_pallas, precision=prec, emit_s2d=emit_s2d)

    (loss, pred_log), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, state.apply_fn, images, depths, si_lambda, loss_kind)

    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    metrics = {
        "loss": loss,
        "grad_norm": optax.global_norm(grads),
        "rmse": losses.depth_metrics(pred_log, depths)["rmse"],
    }
    return state.replace(step=state.step + 1, params=new_params,
                         opt_state=new_opt_state,
                         ema_params=_ema_update(state, new_params,
                                                ema_decay)), metrics


def _train_step_accum(state, img_u8, depth_raw, rng, *, input_hw, target_hw,
                      si_lambda, augment, use_pallas, prec, emit_s2d,
                      grad_accum, ema_decay=0.0, loss_kind="si"):
    """Gradient-accumulation body (see train_step docstring). Traced under
    train_step's jit; grad_accum is static there."""
    if img_u8.shape[0] % grad_accum:
        raise ValueError(
            f"global batch {img_u8.shape[0]} is not divisible by "
            f"grad_accum={grad_accum}")
    base_key = jax.random.fold_in(rng, state.step) if augment else None
    # si_lambda/loss_kind included so `loss` finalizes to the mean
    # per-image training loss over the full effective batch (same as
    # accum=1).
    stats_fn = functools.partial(losses.depth_metric_stats,
                                 si_lambda=si_lambda, loss_kind=loss_kind)

    def one(img, dep, key):
        images, depths = preprocess.preprocess_batch(
            img, dep, input_hw, target_hw, key=key,
            use_pallas=use_pallas, precision=prec, emit_s2d=emit_s2d)
        grads, pred_log = jax.grad(loss_fn, has_aux=True)(
            state.params, state.apply_fn, images, depths, si_lambda,
            loss_kind)
        return grads, stats_fn(pred_log, depths)

    grads, stats = accumulate_microbatches(
        one, img_u8, depth_raw, grad_accum=grad_accum, augment=augment,
        base_key=base_key, grads_like=state.params, stats_fn=stats_fn,
        target_hw=target_hw)

    updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
    new_params = optax.apply_updates(state.params, updates)

    fin = losses.finalize_depth_metrics(stats)
    metrics = {
        "loss": fin["loss"],
        "grad_norm": optax.global_norm(grads),
        "rmse": fin["rmse"],
    }
    return state.replace(step=state.step + 1, params=new_params,
                         opt_state=new_opt_state,
                         ema_params=_ema_update(state, new_params,
                                                ema_decay)), metrics


@functools.partial(
    jax.jit,
    static_argnames=("teacher_apply", "input_hw", "target_hw", "si_lambda",
                     "augment", "resize_precision", "distill_alpha",
                     "ema_decay", "loss_kind"),
    donate_argnames=("state",),
)
def distill_train_step(state: TrainState, teacher_params, img_u8, depth_raw,
                       rng, *, teacher_apply, input_hw, target_hw,
                       si_lambda=0.5, augment=False,
                       resize_precision="default", distill_alpha=0.5,
                       ema_decay=0.0, loss_kind="si"):
    """One fused device step with knowledge distillation (Hinton et al.
    2015, adapted to dense regression): the frozen teacher's log-depth map
    is a second regression target for the student.

        loss = (1 - alpha) * depth_loss(student, gt)
             + alpha * mean((student_log - teacher_log)^2)

    The teacher forward runs inside the SAME jitted program (its params are
    a non-donated input, so XLA keeps one copy in HBM and the whole
    student-step + teacher-forward compiles into one TPU program — no extra
    dispatch per step). The distillation term is an L2 in log-depth: scale
    differences the SI loss forgives are exactly what the student should
    copy from a well-trained teacher. When the teacher's output grid
    differs from the student's (e.g. encdec teacher at /2 stride
    distilling into the 3-conv `small` net at /8), the teacher map is
    bilinearly resized to the student's grid — teacher targets are dense
    and maskless, so plain resize is exact enough.

    Both models consume one shared preprocessed RGB batch (emit_s2d stays
    off: the s2d fast layout is per-stem, and the two stems may differ).
    Completes the compression ladder next to --quant int8/int8-qat: train
    a big teacher once (e.g. encdec-w2), distill it into the cheap serving
    model. The reference has no equivalent (single fixed model per run).
    """
    prec = (jax.lax.Precision.HIGHEST if resize_precision == "highest"
            else jax.lax.Precision.DEFAULT)
    key = jax.random.fold_in(rng, state.step) if augment else None
    images, depths = preprocess.preprocess_batch(
        img_u8, depth_raw, input_hw, target_hw, key=key, precision=prec)

    teacher_log = jax.lax.stop_gradient(
        teacher_apply({"params": teacher_params}, images)).astype(jnp.float32)
    if teacher_log.shape[1:3] != tuple(target_hw):
        teacher_log = jax.image.resize(
            teacher_log, (teacher_log.shape[0], *target_hw,
                          teacher_log.shape[-1]), method="bilinear")

    def dloss(params):
        pred_log = state.apply_fn({"params": params}, images)
        gt_loss = losses.depth_loss(pred_log, depths, kind=loss_kind,
                                    lam=si_lambda)
        match = jnp.mean(jnp.square(pred_log.astype(jnp.float32)
                                    - teacher_log))
        loss = (1.0 - distill_alpha) * gt_loss + distill_alpha * match
        return loss, (pred_log, gt_loss, match)

    (loss, (pred_log, gt_loss, match)), grads = jax.value_and_grad(
        dloss, has_aux=True)(state.params)

    updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
    new_params = optax.apply_updates(state.params, updates)

    metrics = {
        "loss": loss,
        "gt_loss": gt_loss,
        "distill": match,
        "grad_norm": optax.global_norm(grads),
        "rmse": losses.depth_metrics(pred_log, depths)["rmse"],
    }
    return state.replace(step=state.step + 1, params=new_params,
                         opt_state=new_opt_state,
                         ema_params=_ema_update(state, new_params,
                                                ema_decay)), metrics


def apply_with_tta(apply_fn, params, images, tta=""):
    """Forward pass with optional test-time augmentation.

    tta="flip": average the prediction with the un-flipped prediction of
    the horizontally mirrored input — the standard depth-eval ensemble
    (Eigen-lineage evaluations mirror at test time). The average is taken
    in LINEAR depth, computed stably in log space:
    log(0.5*(e^a + e^b)) = logaddexp(a, b) - log 2. Costs a second
    forward pass; priced on the synthetic convergence protocol
    (benchmarks/exp_tta.py, BASELINE.md)."""
    pred_log = apply_fn({"params": params}, images)
    if tta == "flip":
        flipped = apply_fn({"params": params}, images[:, :, ::-1, :])
        pred_log = (jnp.logaddexp(pred_log, flipped[:, :, ::-1, :])
                    - jnp.log(2.0).astype(pred_log.dtype))
    elif tta:
        raise ValueError(f"unknown tta mode {tta!r} (have: 'flip')")
    return pred_log


def apply_alignment(pred_log, depths, align="", mask=None):
    """Optional per-image scale alignment of the prediction against GT
    before metrics — the standard protocol for scale-ambiguous monocular
    depth (Zhou et al. 2017 / Monodepth2): scale each predicted map by
    median(gt) / median(pred) over valid pixels, i.e. a per-image shift
    of log median(gt) - log median(pred) in log-depth. Eval-only (needs
    GT); measures depth *structure* with the global scale factored out.

    align="" (default) is a no-op; "median" applies the protocol. An
    all-invalid image gets shift 0 (its stats are zero-weighted anyway).
    mask (e.g. an eval crop): the medians are computed only over masked
    valid pixels — the literature protocol computes the scale ratio
    inside the crop (monodepth2's evaluate_depth masks before median).
    """
    if not align:
        return pred_log
    if align != "median":
        raise ValueError(f"unknown align mode {align!r} (have: 'median')")
    from ann3depth_tpu.compat import reference_spec as ref

    t = jnp.asarray(depths, jnp.float32)
    p = pred_log.reshape(t.shape).astype(jnp.float32)
    valid = losses._flatten_mask(t, mask)
    axes = tuple(range(1, t.ndim))
    med_gt = jnp.nanmedian(jnp.where(valid, t, jnp.nan), axis=axes)
    med_pr = jnp.nanmedian(jnp.where(valid, jnp.exp(p), jnp.nan), axis=axes)
    shift = (jnp.log(jnp.maximum(med_gt, ref.DEPTH_EPS))
             - jnp.log(jnp.maximum(med_pr, ref.DEPTH_EPS)))
    shift = jnp.nan_to_num(shift)  # all-invalid image -> no shift
    return pred_log + shift.reshape(
        (-1,) + (1,) * (pred_log.ndim - 1)).astype(pred_log.dtype)


@functools.partial(jax.jit, static_argnames=("input_hw", "target_hw",
                                             "si_lambda", "use_pallas",
                                             "loss_kind", "tta", "align",
                                             "crop"))
def eval_stats_step(state: TrainState, img_u8, depth_raw, *, input_hw,
                    target_hw, si_lambda=0.5, use_pallas=False,
                    loss_kind="si", tta="", align="", crop=""):
    """Eval: preprocess -> forward -> SUFFICIENT STATISTICS (no augment).

    Returns summable f32 scalars (losses.depth_metric_stats); the eval loop
    accumulates them across the split and finalizes once, so dataset RMSE is
    the global-pixel RMSE (reference_spec.EVAL_ACCUMULATION), not a mean of
    per-batch means. si_lambda must match the training config so train/eval
    loss curves are comparable.

    crop='eigen'|'garg': restrict metrics (and the --align median window)
    to the literature's fractional eval crop (reference_spec.EVAL_CROPS) —
    a compile-time [h, w] mask ANDed into pixel validity."""
    images, depths = preprocess.preprocess_batch(
        img_u8, depth_raw, input_hw, target_hw, key=None,
        use_pallas=use_pallas)
    mask = losses.eval_crop_mask(target_hw, crop)
    pred_log = apply_with_tta(state.apply_fn, state.params, images, tta)
    pred_log = apply_alignment(pred_log, depths, align, mask)
    return losses.depth_metric_stats(pred_log, depths, mask,
                                     si_lambda=si_lambda,
                                     loss_kind=loss_kind)


@functools.partial(jax.jit, static_argnames=("input_hw", "target_hw",
                                             "si_lambda", "use_pallas",
                                             "loss_kind", "tta", "align",
                                             "crop"))
def eval_report_step(state: TrainState, img_u8, depth_raw, *, input_hw,
                     target_hw, si_lambda=0.5, use_pallas=False,
                     loss_kind="si", tta="", align="", crop=""):
    """Eval with per-image attribution (loop.evaluate's report path).

    One device program returns (per_image_stats [B]-leaved dict incl. the
    per-image training loss, images, depths, pred_log) so the report loop
    can rank images and render worst-K triples without a second forward.
    jnp.sum of each stats leaf equals depth_metric_stats' global sums, so
    the report eval accumulates the same dataset metrics. crop: same
    literature eval-crop mask as eval_stats_step."""
    images, depths = preprocess.preprocess_batch(
        img_u8, depth_raw, input_hw, target_hw, key=None,
        use_pallas=use_pallas)
    mask = losses.eval_crop_mask(target_hw, crop)
    pred_log = apply_with_tta(state.apply_fn, state.params, images, tta)
    pred_log = apply_alignment(pred_log, depths, align, mask)
    per = losses.per_image_metric_stats(pred_log, depths, mask)
    per["si_loss"] = losses.per_image_depth_loss(
        pred_log, depths, mask, kind=loss_kind, lam=si_lambda)
    return per, images, depths, pred_log


def eval_step(state: TrainState, img_u8, depth_raw, *, input_hw, target_hw,
              si_lambda=0.5, use_pallas=False):
    """One-batch metric dict (convenience wrapper over eval_stats_step)."""
    return losses.finalize_depth_metrics(jax.device_get(eval_stats_step(
        state, img_u8, depth_raw, input_hw=input_hw, target_hw=target_hw,
        si_lambda=si_lambda, use_pallas=use_pallas)))


@functools.partial(jax.jit, static_argnames=("apply_fn", "input_hw",
                                             "use_pallas", "tta"))
def infer_step(apply_fn, params, img_u8, *, input_hw, use_pallas=False,
               tta=""):
    """Inference: raw uint8 frame(s) -> linear depth map [B,h,w]."""
    images = preprocess.preprocess_image(img_u8, input_hw,
                                         use_pallas=use_pallas)
    pred_log = apply_with_tta(apply_fn, params, images, tta)
    return jnp.exp(pred_log[..., 0])


def init_params(model, input_hw, seed=0):
    """Initialize params with a dummy batch (shape-only, on host is fine)."""
    dummy = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
    variables = model.init(jax.random.key(seed), dummy)
    params = variables["params"]
    if isinstance(params, FrozenDict):
        params = params.unfreeze()
    return params
