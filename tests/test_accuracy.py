"""Accuracy regression gate on the deterministic synthetic mosaic.

The offline proxy for the north star's accuracy half (BASELINE.md): the
textured-mosaic dataset (stego_tpu/data/synthetic.py) is hard enough that
cluster mIoU lands strictly below 100 with a random backbone, so drops are
visible. Thresholds sit ~15% below the measured values (CPU, seed 0:
linear mIoU 72.5 / Acc 86.8, cluster mIoU 22.2 / Acc 46.2 at 40 steps) —
tight enough to catch real regressions, loose enough for numeric jitter;
the full-size chip numbers live in BASELINE.md (scripts/accuracy_bench.py,
which hard-asserts its own chip-level bands).
"""

import numpy as np

from stego_tpu.data.synthetic import tiny_benchmark_setup
from stego_tpu.train.app import train
from stego_tpu.train.knn_app import precompute_knns


def test_synthetic_mosaic_accuracy(tmp_path):
    cfg, vit = tiny_benchmark_setup(str(tmp_path), experiment_name="acc_test")
    precompute_knns(cfg, dataset_names=["directory"], crop_types=[None],
                    vit_cfg=vit, res=64, batch_size=8)
    m = train(cfg, vit_cfg=vit)
    assert np.isfinite(list(m.values())).all()
    # regression bands: ~15% below the measured values (re-measured 2026-08-18
    # on CPU, seed 0: linear mIoU 72.5 / Acc 86.8, cluster mIoU 22.2 /
    # Acc 46.2) so a real regression trips while numeric jitter passes
    # (round-3 VERDICT: the old 45%-drop bands couldn't do their job).
    assert m["test/linear/mIoU"] >= 61.0, m
    assert m["test/linear/Accuracy"] >= 73.0, m
    assert m["test/cluster/mIoU"] >= 18.5, m
    assert m["test/cluster/Accuracy"] >= 39.0, m
    # the task must stay non-trivial: cluster probe strictly below ceiling
    assert m["test/cluster/mIoU"] <= 95.0, m


def test_synthetic_generator_deterministic():
    from stego_tpu.data.synthetic import render_scene

    img_a, lbl_a = render_scene(np.random.default_rng(3), 32, 4)
    img_b, lbl_b = render_scene(np.random.default_rng(3), 32, 4)
    np.testing.assert_array_equal(img_a, img_b)
    np.testing.assert_array_equal(lbl_a, lbl_b)
    assert img_a.min() >= 0.0 and img_a.max() <= 1.0
    assert set(np.unique(lbl_a)) <= {-1, 0, 1, 2, 3}
