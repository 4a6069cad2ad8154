"""Five-crop materialization -> CroppedDataset round trip."""

import os

import numpy as np

from stego_tpu.data.crop import five_crop_boxes, materialize_crops
from stego_tpu.data.datasets import CroppedDataset
from stego_tpu.data.transforms import get_transform

from tests.test_integration import data_root, make_cfg  # noqa: F401


def test_five_crop_boxes():
    boxes = five_crop_boxes(10, 20, 5, 10)
    assert boxes == [(0, 0), (0, 10), (5, 0), (5, 10), (2, 5)]


def test_materialize_and_reload(data_root, tmp_path):
    cfg = make_cfg(data_root, tmp_path)
    out = materialize_crops(cfg, "directory", "train", crop_type="five",
                            crop_ratio=0.5)
    # the tree name matches what CroppedDataset expects
    assert out.endswith("directory_five_crop_0.5")
    img_dir = os.path.join(out, "img", "train")
    assert len(os.listdir(img_dir)) == 16 * 5

    ds = CroppedDataset(
        cfg.pytorch_data_dir, "directory", "five", 0.5, "train",
        get_transform(16, False, "center"), get_transform(16, True, "center"),
    )
    assert len(ds) == 80
    img, label, mask = ds[0]
    assert img.shape == (16, 16, 3)
    # labels survive the +1/-1 round trip; 255 (ignore) wraps via uint8 to -1,
    # matching the reference's intent (crop_datasets.py:121)
    vals = set(int(v) for v in np.unique(label))
    assert vals <= {-1, 0, 1, 2}


def test_config_yaml_roundtrip():
    from stego_tpu.config import Config

    cfg = Config.from_yaml("stego_tpu/configs/train_config.yml")
    assert cfg.dim == 70
    assert cfg.feature_samples == 11
    assert cfg.neg_inter_weight == 0.63
    cfg_eval = Config.from_yaml("stego_tpu/configs/eval_config.yml")
    assert cfg_eval.res == 320
    assert cfg_eval.model_paths
