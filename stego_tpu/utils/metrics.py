"""Hungarian-matched unsupervised segmentation metrics.

Behavioral reference: UnsupervisedMetrics (src/utils.py:203-274). The confusion
matrix accumulates **on device** inside jit (a masked scatter-add — when the
batch is sharded over a data mesh the replicated output is an implicit psum,
replacing torchmetrics' dist_sync), and the Hungarian assignment runs on host
at compute() time exactly like the reference's scipy call.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment


def update_conf_matrix(
    stats: jnp.ndarray,
    preds: jnp.ndarray,
    target: jnp.ndarray,
    n_classes: int,
    extra_clusters: int,
) -> jnp.ndarray:
    """One jit-able confusion-matrix update.

    Parity with reference update (src/utils.py:219-229) including its masking
    quirk: predictions are also required to be ``< n_classes`` (which, when
    ``extra_clusters > 0``, drops pixels assigned to extra clusters — kept
    bit-for-bit for metric parity).

    Args:
      stats: (n_classes+extra, n_classes) int64 accumulator.
      preds/target: integer arrays of any (same) shape.
    Returns: updated stats.
    """
    import jax

    actual = target.reshape(-1).astype(jnp.int32)
    preds = preds.reshape(-1).astype(jnp.int32)
    mask = (
        (actual >= 0) & (actual < n_classes) & (preds >= 0) & (preds < n_classes)
    )
    total = n_classes + extra_clusters
    # counts[a, p] = sum over pixels of [actual==a][preds==p]: a masked
    # one-hot matmul on the MXU. (A scatter-add serializes on TPU — it was
    # most of the val-step's non-trunk time; this is exact: 0/1 products,
    # f32 accumulation, < 2^24 pixels per update.)
    a1 = jax.nn.one_hot(jnp.where(mask, actual, -1), n_classes,
                        dtype=jnp.bfloat16)
    p1 = jax.nn.one_hot(preds, total, dtype=jnp.bfloat16)
    counts = jax.lax.dot_general(
        a1, p1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return stats + counts.T.astype(stats.dtype)


class UnsupervisedMetrics:
    """Stateful host-side wrapper (mirrors the torchmetrics Metric surface)."""

    def __init__(
        self,
        prefix: str,
        n_classes: int,
        extra_clusters: int,
        compute_hungarian: bool,
    ):
        self.prefix = prefix
        self.n_classes = n_classes
        self.extra_clusters = extra_clusters
        self.compute_hungarian = compute_hungarian
        self.reset()

    def reset(self):
        self.stats = np.zeros(
            (self.n_classes + self.extra_clusters, self.n_classes), dtype=np.int64
        )
        self.assignments: Tuple[np.ndarray, np.ndarray] | None = None
        self.histogram: np.ndarray | None = None

    def update(self, preds, target):
        self.stats = np.asarray(
            update_conf_matrix(
                jnp.asarray(self.stats), jnp.asarray(preds), jnp.asarray(target),
                self.n_classes, self.extra_clusters,
            )
        )

    def merge_stats(self, stats: np.ndarray):
        """Accumulate an externally computed confusion matrix (e.g. the psum'd
        output of a sharded eval step)."""
        self.stats = self.stats + np.asarray(stats, dtype=np.int64)

    def map_clusters(self, clusters):
        """Relabel cluster ids to Hungarian-matched classes
        (reference src/utils.py:231-243); unmatched extras -> -1."""
        assert self.assignments is not None, "call compute() first"
        clusters = np.asarray(clusters)
        if self.extra_clusters == 0:
            return np.asarray(self.assignments[1])[clusters]
        missing = sorted(
            set(range(self.n_classes + self.extra_clusters))
            - set(self.assignments[0])
        )
        cluster_to_class = np.asarray(self.assignments[1])
        for missing_entry in missing:
            if missing_entry == cluster_to_class.shape[0]:
                cluster_to_class = np.append(cluster_to_class, -1)
            else:
                cluster_to_class = np.insert(cluster_to_class, missing_entry + 1, -1)
        return cluster_to_class[clusters]

    def compute(self) -> Dict[str, float]:
        """Hungarian match + mIoU / Accuracy (reference src/utils.py:245-274),
        including the extra-clusters overflow-row path."""
        stats = self.stats
        if self.compute_hungarian:
            self.assignments = linear_sum_assignment(stats, maximize=True)
            if self.extra_clusters == 0:
                self.histogram = stats[np.argsort(self.assignments[1]), :]
            else:
                self.assignments_t = linear_sum_assignment(stats.T, maximize=True)
                histogram = stats[self.assignments_t[1], :]
                missing = list(
                    set(range(self.n_classes + self.extra_clusters))
                    - set(self.assignments[0])
                )
                new_row = stats[missing, :].sum(0, keepdims=True)
                histogram = np.concatenate([histogram, new_row], axis=0)
                new_col = np.zeros((self.n_classes + 1, 1), dtype=histogram.dtype)
                self.histogram = np.concatenate([histogram, new_col], axis=1)
        else:
            self.assignments = (
                np.arange(self.n_classes)[:, None],
                np.arange(self.n_classes)[:, None],
            )
            self.histogram = stats

        hist = self.histogram.astype(np.float64)
        tp = np.diag(hist)
        fp = hist.sum(axis=0) - tp
        fn = hist.sum(axis=1) - tp

        with np.errstate(divide="ignore", invalid="ignore"):
            iou = tp / (tp + fp + fn)
        opc = tp.sum() / hist.sum() if hist.sum() > 0 else float("nan")

        return {
            self.prefix + "mIoU": 100.0 * float(np.nanmean(iou)),
            self.prefix + "Accuracy": 100.0 * float(opc),
        }
