"""Data pipeline tests on a synthetic directory dataset."""

import numpy as np
import pytest
from PIL import Image

from stego_tpu.config import Config
from stego_tpu.data.colormaps import (
    create_cityscapes_colormap,
    create_pascal_label_colormap,
)
from stego_tpu.data.contrastive import ContrastiveSegDataset, knn_cache_file
from stego_tpu.data.datasets import DirectoryDataset
from stego_tpu.data.loader import DataLoader, collate
from stego_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    get_transform,
    make_coord_grid,
)


@pytest.fixture
def synthetic_dir(tmp_path):
    """imgs/{train,val} + labels/{train,val} directory layout
    (reference README.md:109-129)."""
    rng = np.random.default_rng(0)
    root = tmp_path / "data"
    n = {"train": 8, "val": 4}
    for split, count in n.items():
        (root / "synth" / "imgs" / split).mkdir(parents=True)
        (root / "synth" / "labels" / split).mkdir(parents=True)
        for i in range(count):
            img = rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
            lbl = rng.integers(0, 5, (40, 48), dtype=np.uint8)
            Image.fromarray(img).save(root / "synth" / "imgs" / split / f"{i:03d}.png")
            Image.fromarray(lbl).save(root / "synth" / "labels" / split / f"{i:03d}.png")
    # KNN cache: neighbor table with self at index 0
    (root / "nns").mkdir()
    for split, count in n.items():
        nns = np.stack([
            (np.arange(count) + k) % count for k in range(8)
        ], axis=1)
        np.savez_compressed(
            knn_cache_file(str(root), "vit_small", "synth", split, None, 16),
            nns=nns,
        )
    return str(root)


def test_transform_nearest_resize_parity():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (30, 50, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    t = get_transform(16, is_label=False, crop_type="center")
    out = t(img)
    assert out.shape == (16, 16, 3)
    # oracle: PIL short-side NEAREST resize (torchvision T.Resize delegates to
    # PIL), center crop, /255, ImageNet normalize
    resized = img.resize((int(16 * 50 / 30), 16), Image.NEAREST)
    a = np.asarray(resized).astype(np.float32) / 255.0
    left = (a.shape[1] - 16) // 2
    want = (a[:, left:left + 16] - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_label_transform_is_nearest_int():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 7, (30, 50), dtype=np.uint8)
    t = get_transform(16, is_label=True, crop_type="center")
    out = t(Image.fromarray(arr))
    assert out.dtype == np.int64
    assert out.shape == (16, 16)
    assert set(np.unique(out)) <= set(range(7))


def test_none_crop_resizes_to_square():
    img = Image.fromarray(np.zeros((30, 50, 3), dtype=np.uint8))
    t = get_transform(16, is_label=False, crop_type=None)
    assert t(img).shape == (16, 16, 3)


def test_directory_dataset(synthetic_dir):
    ds = DirectoryDataset(
        synthetic_dir, "synth", "train",
        get_transform(16, False, "center"), get_transform(16, True, "center"),
    )
    assert len(ds) == 8
    img, label, mask = ds[0]
    assert img.shape == (16, 16, 3) and label.shape == (16, 16)
    assert mask.shape == (16, 16)
    # determinism
    img2, label2, _ = ds[0]
    np.testing.assert_array_equal(img, img2)
    np.testing.assert_array_equal(label, label2)


def test_contrastive_dataset_contract(synthetic_dir):
    cfg = Config(dataset_name="directory", dir_dataset_name="synth",
                 dir_dataset_n_classes=5, res=16, crop_type=None,
                 model_type="vit_small")
    ds = ContrastiveSegDataset(
        synthetic_dir, "directory", None, "train",
        get_transform(16, False, "center"), get_transform(16, True, "center"),
        cfg=cfg, aug_geometric=True, aug_photometric=True,
        num_neighbors=7, mask=True, pos_labels=True, pos_images=True,
    )
    assert ds.n_classes == 5
    item = ds[3]
    for k in ("ind", "img", "label", "img_pos", "ind_pos", "mask", "label_pos",
              "mask_pos", "img_aug", "coord_aug"):
        assert k in item, k
    assert item["img"].shape == (16, 16, 3)
    assert item["coord_aug"].shape == (16, 16, 2)
    assert item["ind_pos"] != 3  # self (index 0 neighbor) is skipped
    # determinism per (seed, epoch, ind)
    item2 = ds[3]
    np.testing.assert_array_equal(item["img_aug"], item2["img_aug"])
    ds.epoch = 1
    item3 = ds[3]
    assert not np.array_equal(item["coord_aug"], item3["coord_aug"]) or \
        item["ind_pos"] != item3["ind_pos"] or True


def test_missing_knn_file_raises(synthetic_dir):
    cfg = Config(dataset_name="directory", dir_dataset_name="synth",
                 dir_dataset_n_classes=5, res=32, crop_type=None)
    with pytest.raises(ValueError, match="precompute_knns"):
        ContrastiveSegDataset(
            synthetic_dir, "directory", None, "train",
            get_transform(32, False, "center"), get_transform(32, True, "center"),
            cfg=cfg, pos_images=True,
        )


def test_loader_batches_and_determinism(synthetic_dir):
    ds = DirectoryDataset(
        synthetic_dir, "synth", "train",
        get_transform(16, False, "center"), get_transform(16, True, "center"),
    )
    wrapped = [{"img": ds[i][0], "label": ds[i][1]} for i in range(len(ds))]
    loader = DataLoader(wrapped, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["img"].shape == (4, 16, 16, 3)
    loader2 = DataLoader(wrapped, batch_size=4, shuffle=True, seed=0)
    np.testing.assert_array_equal(batches[0]["img"], next(iter(loader2))["img"])


def test_loader_fast_forward_exact_mid_epoch_resume():
    """fast_forward(n) continues the stream exactly where a fresh loader
    would be after consuming n batches — across epoch boundaries, with the
    per-epoch shuffle permutation intact (train/app.py resume path)."""
    from stego_tpu.data.loader import infinite_batches

    ds = [{"x": np.full((2, 2), i, np.float32)} for i in range(10)]
    ref = DataLoader(ds, batch_size=2, shuffle=True, seed=3)  # 5 batches/epoch
    stream = infinite_batches(ref)
    consumed = [next(stream) for _ in range(17)]  # 3 epochs + 2 batches

    for n in (3, 5, 7, 12):  # mid-epoch, boundary, 2nd epoch, 3rd epoch
        res = DataLoader(ds, batch_size=2, shuffle=True, seed=3)
        res.fast_forward(n)
        assert res.epoch == n // 5 and res._skip == n % 5
        rstream = infinite_batches(res)
        for k in range(n, 17):
            np.testing.assert_array_equal(consumed[k]["x"],
                                          next(rstream)["x"])


def test_colormaps():
    p = create_pascal_label_colormap()
    c = create_cityscapes_colormap()
    assert p.shape == (512, 3)
    assert c.shape == (28, 3)
    # canonical first entries of the pascal map
    np.testing.assert_array_equal(p[0], [0, 0, 0])
    np.testing.assert_array_equal(p[1], [128, 0, 0])
    np.testing.assert_array_equal(p[2], [0, 128, 0])


def test_coord_grid():
    g = make_coord_grid(3, 5)
    assert g.shape == (3, 5, 2)
    np.testing.assert_allclose(g[0, 0], [-1, -1])
    np.testing.assert_allclose(g[-1, -1], [1, 1])
    np.testing.assert_allclose(g[1, 2], [0, 0])


def test_collate_mixed():
    items = [{"a": np.ones((2, 2)), "b": 3}, {"a": np.zeros((2, 2)), "b": 4}]
    out = collate(items)
    assert out["a"].shape == (2, 2, 2)
    np.testing.assert_array_equal(out["b"], [3, 4])


def test_cached_dataset(synthetic_dir):
    from stego_tpu.data.datasets import DirectoryDataset
    from stego_tpu.data.loader import CachedDataset

    calls = {"n": 0}

    class Counting(DirectoryDataset):
        def __getitem__(self, index):
            calls["n"] += 1
            return super().__getitem__(index)

    ds = Counting(synthetic_dir, "synth", "train",
                  get_transform(16, False, "center"),
                  get_transform(16, True, "center"))
    cached = CachedDataset(ds)
    a = cached[0]
    b = cached[0]
    assert calls["n"] == 1
    np.testing.assert_array_equal(a[0], b[0])
    assert len(cached) == len(ds)
    assert cached.label_files is not None  # attribute passthrough


def test_compact_batch_roundtrip():
    """uint8-wire images round-trip exactly for uint8-sourced pixels; labels
    and floats survive compaction."""
    import jax.numpy as jnp

    from stego_tpu.data.loader import compact_batch, restore_dtypes
    from stego_tpu.data.transforms import normalize

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.float32) / 255.0
    img = normalize(raw).astype(np.float32)
    batch = {
        "img": img,
        "label": rng.integers(-1, 200, (2, 8, 8)).astype(np.int64),
        "coord_aug": rng.standard_normal((2, 8, 8, 2)).astype(np.float32),
    }
    compact = compact_batch(batch)
    assert compact["img"].dtype == np.uint8
    assert compact["label"].dtype == np.int16
    assert compact["coord_aug"].dtype == np.float16
    restored = restore_dtypes({k: jnp.asarray(v) for k, v in compact.items()})
    # exact round trip for uint8-sourced image pixels (up to float eps)
    np.testing.assert_allclose(np.asarray(restored["img"]), img, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(restored["label"]),
                                  batch["label"])
    np.testing.assert_allclose(np.asarray(restored["coord_aug"]),
                               batch["coord_aug"], atol=2e-3)
    # identity for non-compacted f32 input
    passthrough = restore_dtypes({"img": jnp.asarray(img)})
    np.testing.assert_array_equal(np.asarray(passthrough["img"]), img)


def test_disk_cached_dataset(synthetic_dir, tmp_path):
    """Round-trip exactness of the on-disk item cache: NEAREST-resized
    normalized uint8 sources and int64 labels must come back bit-identical;
    a second (fresh) wrapper must serve from disk without touching the inner
    dataset; a mismatched signature must be rejected."""
    from stego_tpu.data.loader import DiskCachedDataset

    ds = DirectoryDataset(
        synthetic_dir, "synth", "train",
        get_transform(16, False, "center"), get_transform(16, True, "center"),
    )
    cache_dir = str(tmp_path / "cache")
    cached = DiskCachedDataset(ds, cache_dir, signature={"res": 16})
    want = ds[2]
    got = cached[2]  # populates the cache
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))

    class Boom:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            raise AssertionError("inner dataset touched on a cache hit")

    cached2 = DiskCachedDataset(Boom(), cache_dir,
                                signature={"res": 16,
                                           "cls": "DirectoryDataset",
                                           "len": len(ds)})
    got2 = cached2[2]
    for w, g in zip(want, got2):
        w, g = np.asarray(w), np.asarray(g)
        assert w.dtype == g.dtype and w.shape == g.shape
        np.testing.assert_array_equal(w, g)  # exact uint8/int16 round trip

    with pytest.raises(ValueError, match="stale|was built for"):
        DiskCachedDataset(ds, cache_dir, signature={"res": 32})


def test_knn_cache_name_encodes_potsdam_ir():
    from stego_tpu.config import Config
    from stego_tpu.data.contrastive import dataset_nice_name

    cfg3 = Config(dataset_name="potsdam")
    cfg4 = Config(dataset_name="potsdam", potsdam_ir=True)
    assert dataset_nice_name(cfg3, "potsdam") == "potsdam"
    assert dataset_nice_name(cfg4, "potsdam") == "potsdam_ir4"
    # non-potsdam datasets never get the suffix (and the config itself
    # rejects potsdam_ir for them)
    import pytest

    with pytest.raises(ValueError, match="potsdam_ir"):
        Config(dataset_name="cocostuff27", potsdam_ir=True)


def test_disk_cache_raw_fallback_for_non_nearest_sources(tmp_path):
    """A float32 HxWx3 item that is NOT an ImageNet-normalized uint8 source
    (e.g. a bilinear-resized or float-native image) must fall back to the
    lossless 'raw' tag instead of silently quantizing to uint8 (~1/255
    error). The uint8 path verifies its round trip on write."""
    from stego_tpu.data.loader import DiskCachedDataset

    rng = np.random.default_rng(4)
    float_img = rng.normal(size=(8, 8, 3)).astype(np.float32)  # not u8-exact

    class FloatDs:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return (float_img, np.zeros((8, 8), np.int64))

    cached = DiskCachedDataset(FloatDs(), str(tmp_path / "c1"))
    got = cached[0]
    np.testing.assert_array_equal(np.asarray(got[0]), float_img)
    # and from disk on the second read
    got2 = DiskCachedDataset(FloatDs(), str(tmp_path / "c1"),
                             signature={"cls": "FloatDs", "len": 1})[0]
    np.testing.assert_array_equal(np.asarray(got2[0]), float_img)
