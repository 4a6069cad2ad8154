"""Metric logging: JSONL/TB writer and the async fetch-decoupling wrapper
(utils/logging.py). The async writer is what keeps the train loop free of
device->host round trips — ordering, device-value fetching, the
fetch-completion imgs_per_sec accounting, and error surfacing all live here.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from stego_tpu.utils.logging import AsyncMetricWriter, MetricLogger


def _read_jsonl(log_dir):
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        return [json.loads(line) for line in f]


def test_metric_logger_jsonl(tmp_path):
    lg = MetricLogger(str(tmp_path), use_tensorboard=False)
    lg.log_scalars(1, {"a": 1.5})
    lg.log_scalars(2, {"a": 2.5, "b": 3.0})
    lg.close()
    recs = _read_jsonl(str(tmp_path))
    assert [r["step"] for r in recs] == [1, 2]
    assert recs[1]["b"] == 3.0


def test_async_writer_orders_and_fetches_device_values(tmp_path):
    lg = MetricLogger(str(tmp_path), use_tensorboard=False)
    w = AsyncMetricWriter(lg)
    for step in range(1, 21):
        # device scalars straight from jnp — the worker fetches them
        w.log_scalars(step, {"loss": jnp.float32(step) * 0.5,
                             "aux": float(step)})
    w.close()
    recs = _read_jsonl(str(tmp_path))
    assert [r["step"] for r in recs] == list(range(1, 21))
    assert recs[9]["loss"] == pytest.approx(5.0)
    assert recs[9]["aux"] == 10.0


def test_async_writer_imgs_per_sec_accounting(tmp_path):
    """_imgs_seen counts convert to imgs_per_sec at fetch-completion
    granularity: the first counted record has no rate (no previous fetch
    timestamp); later ones carry a positive rate; counts accumulated across
    a bulk drain are attributed to the drain's last counted record."""
    import time

    lg = MetricLogger(str(tmp_path), use_tensorboard=False)
    w = AsyncMetricWriter(lg)
    for step in (10, 20, 30):
        w.log_scalars(step, {"loss": jnp.float32(1.0),
                             "_imgs_seen": 160.0})
        # force one drain per record (otherwise a single bulk drain emits at
        # most one rate — and none when it is the first drain)
        deadline = time.time() + 5.0
        while not w._q.empty() and time.time() < deadline:
            time.sleep(0.01)
        time.sleep(0.02)
    w.close()
    recs = _read_jsonl(str(tmp_path))
    assert len(recs) == 3
    for r in recs:
        assert "_imgs_seen" not in r
    rates = [r.get("imgs_per_sec") for r in recs]
    # at least one record carries a rate and every present rate is positive
    assert any(v is not None for v in rates[1:])
    assert all(v > 0 for v in rates if v is not None)


def test_async_writer_histograms_and_images(tmp_path):
    class Spy:
        def __init__(self):
            self.calls = []

        def log_scalars(self, step, scalars):
            self.calls.append(("scalars", step, scalars))

        def log_histogram(self, step, name, values):
            self.calls.append(("hist", step, name, np.asarray(values).shape))

        def log_histogram_counts(self, step, name, counts, lo, hi):
            self.calls.append(("hist_counts", step, name,
                               int(np.sum(counts)), lo, hi))

        def log_image(self, step, name, img):
            self.calls.append(("image", step, name, np.asarray(img).shape))

        def close(self):
            self.calls.append(("close",))

    spy = Spy()
    w = AsyncMetricWriter(spy)
    w.log_histogram_counts(5, "h", jnp.ones((64,), jnp.int32), -1.0, 1.0)
    w.log_image(6, "img", jnp.zeros((4, 4, 3)))
    w.log_scalars(7, {"x": jnp.float32(3)})
    w.close()
    kinds = [c[0] for c in spy.calls]
    assert kinds == ["hist_counts", "image", "scalars", "close"]
    assert spy.calls[0][3] == 64  # counts summed after device_get
    assert spy.calls[1][3] == (4, 4, 3)


def test_async_writer_surfaces_errors_at_close(tmp_path):
    class Boom:
        def log_scalars(self, step, scalars):
            raise RuntimeError("disk full")

        def close(self):
            pass

    w = AsyncMetricWriter(Boom())
    w.log_scalars(1, {"a": 1.0})
    with pytest.raises(RuntimeError, match="async metric logging failed"):
        w.close()
