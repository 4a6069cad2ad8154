"""Native fused image decoder (native/imageio.cpp + data/native_io.py).

The contract under test: routing a file path through the native path is
BIT-IDENTICAL to the PIL pipeline (reference get_transform semantics,
src/utils.py:128-183), including the random-crop rng draws, and every
ineligible input falls back to PIL transparently.
"""

import numpy as np
import pytest
from PIL import Image

from stego_tpu.data import native_io
from stego_tpu.data.loader import DataLoader, effective_threads
from stego_tpu.data.native_io import decode_transform_path
from stego_tpu.data.transforms import get_transform

pytestmark = pytest.mark.skipif(
    not native_io.native_loader_available(),
    reason="native imageio unavailable (no libjpeg/libpng dev files)",
)


def _write_corpus(tmp_path, rng):
    """One file per (container, mode) the decoder claims to handle."""
    h, w = int(rng.integers(60, 300)), int(rng.integers(60, 300))
    arr = rng.integers(0, 255, (h, w, 3), np.uint8)
    out = []
    p = str(tmp_path / "rgb.jpg")
    Image.fromarray(arr).save(p, quality=85)
    out.append(p)
    p = str(tmp_path / "gray.jpg")
    Image.fromarray(arr[..., 0]).save(p, quality=85)
    out.append(p)
    p = str(tmp_path / "rgb.png")
    Image.fromarray(arr).save(p)
    out.append(p)
    p = str(tmp_path / "pal.png")
    Image.fromarray(arr).convert("P", palette=Image.ADAPTIVE).save(p)
    out.append(p)
    p = str(tmp_path / "rgba.png")
    a = np.concatenate([arr, rng.integers(0, 255, (h, w, 1), np.uint8)], -1)
    Image.fromarray(a).save(p)
    out.append(p)
    p = str(tmp_path / "lab.png")  # COCO-annotation-like gray label
    Image.fromarray((arr[..., 0] % 27).astype(np.uint8)).save(p)
    out.append(p)
    return out


def test_bitwise_parity_with_pil(tmp_path):
    rng = np.random.default_rng(0)
    checked = 0
    for path in _write_corpus(tmp_path, rng):
        for crop in (None, "center", "random"):
            for is_label in (False, True):
                res = int(rng.integers(32, 200))
                t = get_transform(res, is_label, crop)
                for force_rgb in ((False, True) if not is_label else (False,)):
                    r1 = np.random.default_rng(42)
                    r2 = np.random.default_rng(42)
                    nat = decode_transform_path(
                        path, res, crop, is_label, r1, force_rgb)
                    assert nat is not None, (path, crop, is_label)
                    img = Image.open(path)
                    if force_rgb and img.mode != "RGB":
                        img = img.convert("RGB")
                    ref = t(img, r2)
                    assert nat.dtype == ref.dtype and nat.shape == ref.shape
                    np.testing.assert_array_equal(nat, ref)
                    # rng streams advanced identically (random crop draws)
                    np.testing.assert_array_equal(
                        r1.integers(0, 1000, 4), r2.integers(0, 1000, 4))
                    checked += 1
    assert checked == 6 * 3 * 3  # files x crops x (label + 2 img variants)


def test_transform_accepts_path(tmp_path):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 255, (120, 150, 3), np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(arr).save(p, quality=90)
    t = get_transform(64, False, "center")
    np.testing.assert_array_equal(t(p), t(Image.open(p)))


def test_ineligible_falls_back_identically(tmp_path):
    """CMYK JPEG: gated out before any rng draw; the PIL fallback must
    produce the pure-PIL answer with the same rng stream."""
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 255, (90, 130, 3), np.uint8)
    p = str(tmp_path / "cmyk.jpg")
    Image.fromarray(arr).convert("CMYK").save(p, quality=90)
    assert decode_transform_path(p, 48, "random",
                                 False, np.random.default_rng(7), False) is None
    t = get_transform(48, False, "random")
    r1, r2 = np.random.default_rng(7), np.random.default_rng(7)
    np.testing.assert_array_equal(
        t(p, r1, force_rgb=True),
        t(Image.open(p).convert("RGB"), r2))
    np.testing.assert_array_equal(r1.integers(0, 1000, 4),
                                  r2.integers(0, 1000, 4))


def test_late_native_failure_preserves_rng_stream(tmp_path, monkeypatch):
    """If the C++ call fails AFTER the crop offsets were drawn, the caller's
    rng must be untouched so the PIL fallback redraws identical offsets."""
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 255, (80, 110, 3), np.uint8)
    p = str(tmp_path / "x.png")
    Image.fromarray(arr).save(p)

    class _FailLib:
        @staticmethod
        def stego_decode_transform(*a, **k):
            return -7  # E_DECODE

    monkeypatch.setattr(native_io, "_lib", lambda: _FailLib())
    t = get_transform(48, False, "random")
    r1, r2 = np.random.default_rng(9), np.random.default_rng(9)
    np.testing.assert_array_equal(t(p, r1), t(Image.open(p), r2))
    np.testing.assert_array_equal(r1.integers(0, 1000, 4),
                                  r2.integers(0, 1000, 4))


def test_native_toggle_dataset_equivalence(tmp_path, monkeypatch):
    """A DirectoryDataset item is identical with the native loader on/off."""
    from stego_tpu.data.datasets import DirectoryDataset

    rng = np.random.default_rng(3)
    for split in ("train",):
        (tmp_path / "synth" / "imgs" / split).mkdir(parents=True)
        (tmp_path / "synth" / "labels" / split).mkdir(parents=True)
        for i in range(2):
            arr = rng.integers(0, 255, (100, 140, 3), np.uint8)
            Image.fromarray(arr).save(
                tmp_path / "synth" / "imgs" / split / f"{i}.jpg")
            lab = rng.integers(0, 5, (100, 140), np.uint8)
            Image.fromarray(lab).save(
                tmp_path / "synth" / "labels" / split / f"{i}.png")

    def make():
        return DirectoryDataset(
            str(tmp_path), "synth", "train",
            get_transform(64, False, "random"),
            get_transform(64, True, "random"), seed=5)

    items_native = [make()[i] for i in range(2)]
    monkeypatch.setattr(native_io, "_DISABLED", True)
    items_pil = [make()[i] for i in range(2)]
    for a, b in zip(items_native, items_pil):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_fast_decode_close_and_gated(tmp_path):
    """fast_decode: DCT-scaled JPEG decode stays close to the exact path,
    is bit-identical when no scale applies, and never touches labels."""
    from stego_tpu.data.transforms import unnormalize

    x = np.linspace(0, 20 * np.pi, 1280)
    y = np.linspace(0, 15 * np.pi, 960)
    base = (127 + 100 * np.sin(x)[None, :, None] *
            np.cos(y)[:, None, None]).clip(0, 255).astype(np.uint8)
    arr = np.repeat(base, 3, axis=2)
    p = str(tmp_path / "big.jpg")
    Image.fromarray(arr).save(p, quality=92)

    exact = decode_transform_path(p, 224, "center", False, None, True)
    fast = decode_transform_path(p, 224, "center", False, None, True,
                                 fast=True)
    assert exact is not None and fast is not None
    assert fast.shape == exact.shape
    d = np.abs(unnormalize(fast) - unnormalize(exact))
    assert d.mean() < 0.05 and np.quantile(d, 0.99) < 0.2

    # upscale target: scale_denom stays 1 -> bit-identical
    small = np.random.default_rng(0).integers(
        0, 255, (150, 200, 3), np.uint8)
    ps = str(tmp_path / "small.jpg")
    Image.fromarray(small).save(ps, quality=92)
    np.testing.assert_array_equal(
        decode_transform_path(ps, 224, "center", False, None, True),
        decode_transform_path(ps, 224, "center", False, None, True,
                              fast=True))

    # labels are always exact: get_transform drops the flag for is_label
    t = get_transform(64, True, "center", fast_decode=True)
    assert t.fast_decode is False


def test_threaded_loader_matches_sequential(tmp_path):
    class _DS:
        def __len__(self):
            return 13

        def __getitem__(self, i):
            r = np.random.default_rng((11, i))
            return {"x": r.normal(size=(4,)).astype(np.float32),
                    "i": np.int64(i)}

    a = list(DataLoader(_DS(), 4, shuffle=True, seed=1, drop_last=False))
    b = list(DataLoader(_DS(), 4, shuffle=True, seed=1, drop_last=False,
                        num_threads=4))
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["x"], bb["x"])
        np.testing.assert_array_equal(ba["i"], bb["i"])


def test_effective_threads_caps_at_cores():
    import os

    cores = os.cpu_count() or 1
    assert effective_threads(24) == min(24, cores)
    assert effective_threads(0) == 0
    assert effective_threads(-3) == 0
