"""ann3depth_tpu — TPU-native monocular depth estimation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
`shoeffner/ann3depth` (TF 1.x monocular depth study project): Make3D / NYU
Depth v2 data pipelines, conv depth networks trained with the
scale-invariant log-depth loss, TensorBoard-style metrics, checkpointing,
and a continuous live-inference path — redesigned TPU-first:

- models are Flax modules compiled by XLA onto the MXU (NHWC, bf16 compute),
- preprocessing is a fused Pallas kernel (uint8 frame -> normalized,
  resized, augmented tensor in one VMEM pass),
- the input feed is double-buffered so H2D transfer overlaps device compute,
- training is data-parallel over an ICI `jax.sharding.Mesh`,
- the live path is a SPSC frame ring-buffer (C++ via ctypes) feeding a
  jitted fused preprocess+forward step.

Reference provenance: the reference tree was unavailable (see SURVEY.md §0);
behavior is built to BASELINE.json's north-star spec. Docstrings cite
`SURVEY.md` sections / `BASELINE.json` lines instead of reference file:line.
"""

__version__ = "0.1.0"
