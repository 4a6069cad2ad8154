"""Dataset loaders against synthetic on-disk trees in the real formats:
Potsdam/.mat, CocoStuff curated lists, Cityscapes leftImg8bit/gtFine."""

import numpy as np
import pytest
from PIL import Image
from scipy.io import savemat

from stego_tpu.data.datasets import (
    COCO_FINE_TO_COARSE,
    CityscapesSeg,
    Coco,
    Potsdam,
    PotsdamRaw,
)
from stego_tpu.data.transforms import get_transform


@pytest.fixture
def potsdam_root(tmp_path):
    root = tmp_path / "data"
    (root / "potsdam" / "imgs").mkdir(parents=True)
    (root / "potsdam" / "gt").mkdir(parents=True)
    rng = np.random.default_rng(0)
    ids = ["2_10_0", "2_10_1", "3_11_0"]
    for i in ids:
        img = rng.integers(0, 255, (40, 40, 4), dtype=np.uint8)  # 4ch w/ IR
        savemat(root / "potsdam" / "imgs" / f"{i}.mat", {"img": img})
        gt = rng.integers(0, 6, (40, 40), dtype=np.uint8)
        gt[0, 0] = 255  # ignore pixel
        savemat(root / "potsdam" / "gt" / f"{i}.mat", {"gt": gt})
    (root / "potsdam" / "labelled_train.txt").write_text(
        "\n".join(ids[:2]) + "\n")
    (root / "potsdam" / "labelled_test.txt").write_text(ids[2] + "\n")
    return str(root)


def test_potsdam_loader(potsdam_root):
    ds = Potsdam(potsdam_root, "train",
                 get_transform(16, False, "center"),
                 get_transform(16, True, "center"), coarse_labels=True)
    assert len(ds) == 2
    img, label, mask = ds[0]
    assert img.shape == (16, 16, 3)  # IR channel dropped
    assert label.shape == (16, 16)
    # coarse mapping: {0,4}->0 {1,5}->1 {2,3}->2 255->-1
    assert set(int(v) for v in np.unique(label)) <= {-1, 0, 1, 2}
    ds_val = Potsdam(potsdam_root, "val",
                     get_transform(16, False, "center"),
                     get_transform(16, True, "center"), coarse_labels=True)
    assert len(ds_val) == 1


def test_potsdam_missing_gt(potsdam_root):
    import os

    os.remove(os.path.join(potsdam_root, "potsdam", "gt", "2_10_0.mat"))
    ds = Potsdam(potsdam_root, "train",
                 get_transform(16, False, "center"),
                 get_transform(16, True, "center"), coarse_labels=True)
    img, label, mask = ds[0]  # falls back to all-ones label
    assert set(int(v) for v in np.unique(label)) <= {1}


def test_potsdamraw_file_grid(tmp_path):
    root = tmp_path / "data"
    proc = root / "potsdamraw" / "processed"
    (proc / "imgs").mkdir(parents=True)
    (proc / "gt").mkdir(parents=True)
    ds = PotsdamRaw(str(root), "all", get_transform(16, False, "center"),
                    get_transform(16, True, "center"), coarse_labels=True)
    assert len(ds) == 38 * 15 * 15
    assert ds.files[0] == "0_0_0.mat"
    assert ds.files[-1] == "37_14_14.mat"


@pytest.fixture
def coco_root(tmp_path):
    root = tmp_path / "data"
    rng = np.random.default_rng(0)
    ids = ["000000000009", "000000000025"]
    for split in ("train2017", "val2017"):
        (root / "cocostuff" / "curated" / split).mkdir(parents=True)
        (root / "cocostuff" / "images" / split).mkdir(parents=True)
        (root / "cocostuff" / "annotations" / split).mkdir(parents=True)
        for i in ids:
            img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                root / "cocostuff" / "images" / split / f"{i}.jpg")
            ann = rng.integers(0, 182, (32, 48), dtype=np.uint8)
            ann[0, :] = 255  # ignore
            Image.fromarray(ann).save(
                root / "cocostuff" / "annotations" / split / f"{i}.png")
        for list_name in ("Coco164kFull_Stuff_Coarse.txt",
                          "Coco164kFew_Stuff_6.txt",
                          "Coco164kFull_Stuff_Coarse_7.txt"):
            (root / "cocostuff" / "curated" / split / list_name).write_text(
                "\n".join(ids) + "\n")
    return str(root)


def test_coco_fine_to_coarse(coco_root):
    ds = Coco(coco_root, "train", get_transform(16, False, "center"),
              get_transform(16, True, "center"),
              coarse_labels=False, exclude_things=False)
    assert len(ds) == 2
    img, label, mask = ds[0]
    assert img.shape == (16, 16, 3)
    vals = set(int(v) for v in np.unique(label))
    assert vals <= set(range(27)) | {-1}
    # mapping table has all 182 fine classes
    assert set(COCO_FINE_TO_COARSE) == set(range(182))
    assert set(COCO_FINE_TO_COARSE.values()) == set(range(27))


def test_coco_exclude_things(coco_root):
    ds = Coco(coco_root, "val", get_transform(16, False, "center"),
              get_transform(16, True, "center"),
              coarse_labels=False, exclude_things=True, subset=7)
    img, label, mask = ds[0]
    # stuff-only: classes shifted by first_stuff_index=12 -> [-12, 14]
    assert label.max() <= 14
    # mask marks stuff pixels
    assert set(np.unique(mask)) <= {0.0, 1.0}


def test_coco_cocostuff3(coco_root):
    ds = Coco(coco_root, "train", get_transform(16, False, "center"),
              get_transform(16, True, "center"),
              coarse_labels=True, exclude_things=True, subset=6)
    img, label, mask = ds[0]
    assert set(int(v) for v in np.unique(label)) <= {-1, 0, 1, 2}


@pytest.fixture
def cityscapes_root(tmp_path):
    root = tmp_path / "data"
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for city in ("aachen", "bochum"):
            img_dir = root / "cityscapes" / "leftImg8bit" / split / city
            gt_dir = root / "cityscapes" / "gtFine" / split / city
            img_dir.mkdir(parents=True)
            gt_dir.mkdir(parents=True)
            for i in range(2):
                base = f"{city}_{i:06d}_000019"
                img = rng.integers(0, 255, (32, 64, 3), dtype=np.uint8)
                Image.fromarray(img).save(img_dir / f"{base}_leftImg8bit.png")
                gt = rng.integers(0, 34, (32, 64), dtype=np.uint8)
                Image.fromarray(gt).save(gt_dir / f"{base}_gtFine_labelIds.png")
                # decoys that must be ignored
                Image.fromarray(gt).save(gt_dir / f"{base}_gtFine_color.png")
    return str(root)


def test_cityscapes_loader(cityscapes_root):
    ds = CityscapesSeg(cityscapes_root, "train",
                       get_transform(16, False, "center"),
                       get_transform(16, True, "center"))
    assert len(ds) == 4  # 2 cities x 2 images
    img, label, mask = ds[0]
    assert img.shape == (16, 16, 3)
    # labels shifted by first_nonvoid=7; negatives -> -1; 27 classes
    assert label.min() >= -1
    assert label.max() <= 26


def test_potsdam_ir_channel(potsdam_root):
    """potsdam_ir keeps the 4th (near-IR) channel — beyond the reference,
    which drops it (reference data.py:153 TODO)."""
    from stego_tpu.data.transforms import CHANNEL_MEAN4, CHANNEL_STD4

    ds3 = Potsdam(potsdam_root, "train", get_transform(16, False, "center"),
                  get_transform(16, True, "center"), coarse_labels=True)
    ds4 = Potsdam(potsdam_root, "train", get_transform(16, False, "center"),
                  get_transform(16, True, "center"), coarse_labels=True,
                  include_ir=True)
    img3, label3, _ = ds3[0]
    img4, label4, _ = ds4[0]
    assert img4.shape == (16, 16, 4)
    np.testing.assert_allclose(img4[..., :3], img3, atol=1e-6)
    np.testing.assert_array_equal(label4, label3)
    # IR channel was normalized with the documented red-channel stats
    raw_ir = img4[..., 3] * CHANNEL_STD4[3] + CHANNEL_MEAN4[3]
    assert (raw_ir >= -1e-5).all() and (raw_ir <= 1 + 1e-5).all()
