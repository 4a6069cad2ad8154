"""Metric logging: JSONL always, TensorBoard when available.

Reference observability surface: TensorBoardLogger with scalars every
``scalar_log_freq`` steps (train_segmentation.py:133,172-177), figure panels
and confusion matrices at validation (:290-359). Here scalars go to a JSONL
stream (machine-readable, survives without TB) and mirrored to TB events when
the writer is importable; figures are rendered by eval/viz helpers.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def log_histogram(self, step: int, name: str, values) -> None:
        if self._tb is not None:
            import numpy as np

            self._tb.add_histogram(name, np.asarray(values), int(step))

    def log_histogram_counts(self, step: int, name: str, counts,
                             lo: float = -1.0, hi: float = 1.0) -> None:
        """Log a pre-binned histogram (counts computed on device)."""
        if self._tb is None:
            return
        import numpy as np

        counts = np.asarray(counts, np.float64)
        nbins = len(counts)
        edges = np.linspace(lo, hi, nbins + 1)
        centers = (edges[:-1] + edges[1:]) / 2
        total = counts.sum()
        if total == 0:
            return
        self._tb.add_histogram_raw(
            name, min=lo, max=hi, num=int(total),
            sum=float((centers * counts).sum()),
            sum_squares=float((centers**2 * counts).sum()),
            bucket_limits=edges[1:].tolist(),
            bucket_counts=counts.tolist(),
            global_step=int(step),
        )

    def log_image(self, step: int, name: str, img_hwc) -> None:
        if self._tb is not None:
            import numpy as np

            self._tb.add_image(name, np.asarray(img_hwc), int(step),
                               dataformats="HWC")

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class NullLogger:
    """No-op logger for non-primary hosts."""

    def log_scalars(self, *a, **k):
        pass

    def log_histogram(self, *a, **k):
        pass

    def log_histogram_counts(self, *a, **k):
        pass

    def log_image(self, *a, **k):
        pass

    def close(self):
        pass
