"""Single home for every reference-derived constant (SURVEY.md §7.3 item 5).

The reference tree was unreadable this session (SURVEY.md §0), so each value
below is either fixed by BASELINE.json (tagged [B:line]) or a documented,
flagged choice to be corrected in one place once the reference is readable.
Nothing outside this module may hard-code a reference behavior constant.
"""

from __future__ import annotations

import dataclasses

# ---------------------------------------------------------------------------
# Canonical tensor shapes.  [B:7,8]: 320x240 RGB input, 160x120 depth target.
# Layout convention everywhere: NHWC, H=rows, W=cols.
# ---------------------------------------------------------------------------
INPUT_H = 240
INPUT_W = 320
TARGET_H = 120
TARGET_W = 160

# Live path frame size [B:10]: 640x480 @ 30 fps webcam frames.
LIVE_FRAME_H = 480
LIVE_FRAME_W = 640

# Make3D laser depth grid is 55 (w) x 305 (h) — stored transposed in the
# original .mat files relative to the 2272x1704 images. SURVEY.md §7.3 item 4.
MAKE3D_DEPTH_H = 305
MAKE3D_DEPTH_W = 55
MAKE3D_IMAGE_H = 2272
MAKE3D_IMAGE_W = 1704

# NYU Depth v2 native frame size.
NYU_H = 480
NYU_W = 640

# DPT stretch config [B:11].
DPT_RES = 384

# ---------------------------------------------------------------------------
# Normalization. FLAGGED CHOICE (reference constants unreadable): scale uint8
# to [0,1] then standardize per-channel with these constants. The values are
# ImageNet statistics, the conventional default for RGB depth-estimation
# inputs; swap here if the reference used plain x/255 or dataset-specific
# statistics.
# ---------------------------------------------------------------------------
RGB_MEAN = (0.485, 0.456, 0.406)
RGB_STD = (0.229, 0.224, 0.225)

# Depth handling: depths are metric (meters). Make3D laser saturates around
# 81 m; the conventional cap (Saxena et al. 2009) is 70 m with far pixels
# masked. FLAGGED CHOICE.
MAKE3D_DEPTH_CAP = 70.0
DEPTH_EPS = 1e-6  # numerical floor before log()

# Depth resampling validity (ADVICE r1): invalid source pixels (outside
# (DEPTH_EPS, MAKE3D_DEPTH_CAP]) must not bleed into valid neighbors through
# the resize triangle weights. Depth is resampled as resize(d*v)/resize(v);
# an output pixel counts as valid only when at least this fraction of its
# resample footprint was valid (else it is written as 0, which every
# downstream mask excludes via the DEPTH_EPS check). FLAGGED CHOICE:
# majority-valid footprint.
DEPTH_VALID_RESAMPLE_THRESH = 0.5

# ---------------------------------------------------------------------------
# Loss. [B:5]: scale-invariant log-depth loss, Eigen et al. 2014 form:
#   d_i = log(pred_i) - log(gt_i)
#   L   = mean(d^2) - lambda * mean(d)^2
# with lambda = 0.5 (the value used in the Eigen paper's main results).
# ---------------------------------------------------------------------------
SI_LOSS_LAMBDA = 0.5

# ---------------------------------------------------------------------------
# Optimizer. FLAGGED CHOICE [K-low in SURVEY §2.1]: Adam with these defaults.
# ---------------------------------------------------------------------------
DEFAULT_LEARNING_RATE = 1e-4
DEFAULT_ADAM_B1 = 0.9
DEFAULT_ADAM_B2 = 0.999

# ---------------------------------------------------------------------------
# Bilinear resize semantics. TF1 resize_bilinear(align_corners=False) is
# `jax.image.resize(method="bilinear")` with half-pixel centers — this is the
# classic pixel-parity trap (SURVEY §7.3 item 3). We standardize on
# half-pixel (align_corners=False) everywhere; flip this flag once the
# reference's call is readable.
# ---------------------------------------------------------------------------
RESIZE_ALIGN_CORNERS = False

# ---------------------------------------------------------------------------
# Eval metric accumulation semantics. FLAGGED CHOICE: "global-pixel" —
# error metrics (RMSE, abs_rel, log10, deltas) are computed over ALL valid
# pixels of the eval split (sufficient statistics summed across batches,
# finalized once: losses.depth_metric_stats / finalize_depth_metrics). The
# eval *loss* is the mean over images of the per-image Eigen loss, matching
# training. The alternative ("per-image": average of per-image metric
# values) is what some Make3D papers report; switch here once the
# reference's eval code is readable.
# ---------------------------------------------------------------------------
EVAL_ACCUMULATION = "global-pixel"

# ---------------------------------------------------------------------------
# Standard literature eval crops (--crop eigen|garg). Published KITTI/NYU
# monocular-depth numbers are crop-conditioned: metrics are computed only
# inside a fixed fractional window of the depth map. Fractions of (H, W) as
# (top, bottom, left, right) — row range [top*H, bottom*H), col range
# [left*W, right*W) — the canonical constants from Eigen et al. 2014's eval
# code as propagated by Garg et al. 2016 and the monodepth/monodepth2
# evaluation scripts. FLAGGED CHOICE: the reference (a Make3D/NYU project)
# may have used no crop at all; these exist so a literature protocol can be
# reproduced end-to-end, and apply to whatever target_hw a config evals at.
# ---------------------------------------------------------------------------
EVAL_CROPS = {
    "eigen": (0.3324324, 0.91351351, 0.0359477, 0.96405229),
    "garg": (0.40810811, 0.99189189, 0.03594771, 0.96405229),
}


@dataclasses.dataclass(frozen=True)
class ReferenceSpec:
    """Bundled view of the constants for code that wants one object."""

    input_h: int = INPUT_H
    input_w: int = INPUT_W
    target_h: int = TARGET_H
    target_w: int = TARGET_W
    rgb_mean: tuple = RGB_MEAN
    rgb_std: tuple = RGB_STD
    si_loss_lambda: float = SI_LOSS_LAMBDA
    depth_cap: float = MAKE3D_DEPTH_CAP


SPEC = ReferenceSpec()
