"""Optional TensorBoard event writer (SURVEY §5 "Metrics / logging").

The reference logged scalars + images to TensorBoard; this sink reproduces
that surface using tf.summary from the installed TensorFlow (lazy import —
TF is heavy and only needed when TB output is requested). JSONL
(utils/metrics_writer.py) remains the primary machine-readable sink.
"""

from __future__ import annotations

import logging
from typing import Mapping, Optional

import numpy as np

log = logging.getLogger(__name__)


class TensorBoardWriter:
    """Thin tf.summary wrapper; no-ops (with one warning) if TF is absent."""

    def __init__(self, logdir: str):
        self._writer = None
        try:
            import tensorflow as tf

            self._tf = tf
            self._writer = tf.summary.create_file_writer(logdir)
        except ImportError:
            log.warning("tensorflow unavailable; TensorBoard output disabled")

    def write_scalars(self, step: int, metrics: Mapping[str, float]):
        if self._writer is None:
            return
        with self._writer.as_default(step=step):
            for k, v in metrics.items():
                try:
                    self._tf.summary.scalar(k, float(v))
                except (TypeError, ValueError):
                    pass

    def write_image(self, step: int, tag: str, img_u8: np.ndarray):
        if self._writer is None:
            return
        with self._writer.as_default(step=step):
            self._tf.summary.image(tag, img_u8[None], max_outputs=1)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
            self._writer = None


def maybe_tb_writer(logdir: Optional[str]) -> Optional[TensorBoardWriter]:
    return TensorBoardWriter(logdir) if logdir else None
