import numpy as np

from stego_tpu.utils.metrics import UnsupervisedMetrics


def test_perfect_predictions_no_hungarian():
    m = UnsupervisedMetrics("t/", 4, 0, compute_hungarian=False)
    labels = np.random.default_rng(0).integers(0, 4, (2, 8, 8))
    m.update(labels, labels)
    out = m.compute()
    assert out["t/mIoU"] == 100.0
    assert out["t/Accuracy"] == 100.0


def test_hungarian_recovers_permutation():
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 5, (4, 16, 16))
    perm = np.array([3, 0, 4, 1, 2])
    preds = perm[labels]
    m = UnsupervisedMetrics("t/", 5, 0, compute_hungarian=True)
    m.update(preds, labels)
    out = m.compute()
    assert out["t/mIoU"] == 100.0
    assert out["t/Accuracy"] == 100.0
    # map_clusters undoes the permutation
    mapped = m.map_clusters(preds)
    np.testing.assert_array_equal(mapped, labels)


def test_ignore_labels_excluded():
    m = UnsupervisedMetrics("t/", 3, 0, compute_hungarian=False)
    labels = np.array([[-1, 0, 1, 2, -1]])
    preds = np.array([[2, 0, 1, 2, 0]])
    m.update(preds, labels)
    assert m.stats.sum() == 3  # only valid-label pixels counted
    out = m.compute()
    assert out["t/Accuracy"] == 100.0


def test_known_confusion_matrix():
    m = UnsupervisedMetrics("t/", 2, 0, compute_hungarian=False)
    labels = np.array([0, 0, 0, 1, 1, 1])
    preds = np.array([0, 0, 1, 1, 1, 0])
    m.update(preds, labels)
    # stats[pred, actual]
    np.testing.assert_array_equal(m.stats, [[2, 1], [1, 2]])
    out = m.compute()
    # per class IoU = 2/(2+1+1) = 0.5
    assert abs(out["t/mIoU"] - 50.0) < 1e-9
    assert abs(out["t/Accuracy"] - 100 * 4 / 6) < 1e-9


def test_extra_clusters_overflow_path():
    rng = np.random.default_rng(2)
    labels = rng.integers(0, 3, (2, 10, 10))
    preds = labels.copy()  # extra clusters never predicted here
    m = UnsupervisedMetrics("t/", 3, 2, compute_hungarian=True)
    m.update(preds, labels)
    out = m.compute()
    assert m.histogram.shape == (4, 4)  # overflow row + zero col
    assert out["t/Accuracy"] == 100.0
    mapped = m.map_clusters(np.arange(5))
    assert mapped.shape == (5,)
    # the three matched clusters map to their classes
    np.testing.assert_array_equal(np.sort(mapped[:3][mapped[:3] >= 0]), [0, 1, 2])


def test_merge_stats_equals_update():
    rng = np.random.default_rng(3)
    labels = rng.integers(-1, 4, (2, 6, 6))
    preds = rng.integers(0, 4, (2, 6, 6))
    a = UnsupervisedMetrics("t/", 4, 0, True)
    a.update(preds, labels)
    b = UnsupervisedMetrics("t/", 4, 0, True)
    b.merge_stats(a.stats)
    np.testing.assert_array_equal(a.stats, b.stats)
    assert a.compute() == b.compute()
