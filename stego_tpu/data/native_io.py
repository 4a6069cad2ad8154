"""Native fast path for the host transform pipeline.

Routes ``Transform`` calls that receive a file *path* through the C++ fused
decoder (``native/imageio.cpp``): header-only PIL open to learn format/mode/
size, resize+crop geometry computed here with the exact arithmetic of the PIL
path (``transforms._resize_short_side`` / ``_center_crop`` / ``_random_crop``
— including identical ``rng.integers`` draws, so downstream sampling stays in
sync), then one ctypes call that decodes only the kept scanlines and writes
the final normalized array. Any ineligible input (CMYK JPEG, interlaced or
16-bit PNG, exotic modes, pad-needed crops, decode errors) returns ``None``
and the caller runs the ordinary PIL path — behavior is identical either way
(asserted bit-exactly in tests/test_native_io.py).

Reference behavior being accelerated: src/utils.py:128-183 (get_transform)
driven by torch DataLoader native workers (src/train_segmentation.py:453).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple, Union

import numpy as np
from PIL import Image

_MODE_IMG_RGB = 0
_MODE_IMG_KEEP_ALPHA = 1
_MODE_LABEL = 2

# PIL modes the C++ decoder handles per container. Anything else -> PIL path.
_OK_MODES = {"JPEG": {"L", "RGB"}, "PNG": {"L", "P", "RGB", "RGBA"}}

_DISABLED = os.environ.get("STEGO_NATIVE_LOADER", "1") == "0"


def _lib():
    if _DISABLED:
        return None
    from stego_tpu.native import load_imageio_library

    return load_imageio_library()


def native_loader_available() -> bool:
    return _lib() is not None


def resized_dims(h: int, w: int, res: Union[int, Tuple[int, int]]
                 ) -> Tuple[int, int]:
    """(h, w) after ``_resize_short_side`` — identical integer arithmetic."""
    if isinstance(res, tuple):
        return res
    if (w <= h and w == res) or (h <= w and h == res):
        return h, w
    if w < h:
        return int(res * h / w), res
    return res, int(res * w / h)


def decode_transform_path(
    path: str,
    res: int,
    crop_type: Optional[str],
    is_label: bool,
    rng: Optional[np.random.Generator],
    force_rgb: bool,
    fast: bool = False,
) -> Optional[np.ndarray]:
    """Run the fused native pipeline for one file, or None to use PIL.

    Output matches the PIL path bit-for-bit: float32 HWC ImageNet-normalized
    images (RGB, or RGBA when the source carries alpha and ``force_rgb`` is
    off) / int64 HW labels. ``fast`` (config ``fast_decode``) additionally
    lets JPEG images decode at a reduced DCT scale that still covers the
    resize target — ~2x faster on large downscales, pixel values no longer
    PIL-identical (the IDCT's area downscale replaces part of the NEAREST
    subsample; arguably higher-quality, but it is a documented deviation).
    """
    lib = _lib()
    if lib is None:
        return None
    try:
        with Image.open(path) as im:  # header-only: no decode
            fmt, mode, (w, h) = im.format, im.mode, im.size
    except Exception:
        return None
    if fmt not in _OK_MODES or mode not in _OK_MODES[fmt]:
        return None

    size: Union[int, Tuple[int, int]] = (res, res) if crop_type is None else res
    rh, rw = resized_dims(h, w, size)
    committed_rng_state = None
    if crop_type is None:
        top, left, oh, ow = 0, 0, rh, rw
    elif crop_type == "center":
        if rh < res or rw < res:
            return None  # pad path: PIL fallback (unreachable after resize)
        top, left, oh, ow = (rh - res) // 2, (rw - res) // 2, res, res
    elif crop_type == "random":
        if rh < res or rw < res:
            return None
        # Same draws in the same order as transforms._random_crop — but from
        # a CLONE: the caller's rng only advances if the native decode
        # succeeds, so a late failure leaves the PIL fallback's draws (and
        # everything downstream) identical to a pure-PIL run.
        r = np.random.default_rng()
        src = rng if rng is not None else np.random.default_rng()
        r.bit_generator.state = src.bit_generator.state
        top = int(r.integers(0, rh - res + 1))
        left = int(r.integers(0, rw - res + 1))
        oh = ow = res
        if rng is not None:
            committed_rng_state = r.bit_generator.state
    else:
        return None

    from stego_tpu.data.transforms import channel_stats

    if is_label:
        cmode, out_c = _MODE_LABEL, 1
        out = np.empty((oh, ow), np.int32)
        mean = std = np.zeros(1, np.float32)
    else:
        keep_alpha = (not force_rgb) and mode == "RGBA"
        cmode = _MODE_IMG_KEEP_ALPHA if keep_alpha else _MODE_IMG_RGB
        out_c = 4 if keep_alpha else 3
        out = np.empty((oh, ow, out_c), np.float32)
        mean, std = channel_stats(out_c)
        mean = np.ascontiguousarray(mean, np.float32)
        std = np.ascontiguousarray(std, np.float32)

    fp = ctypes.POINTER(ctypes.c_float)
    ret = lib.stego_decode_transform(
        path.encode(), w, h, rh, rw, top, left, oh, ow, cmode,
        0 if is_label else 1, 1 if (fast and not is_label) else 0,
        mean.ctypes.data_as(fp), std.ctypes.data_as(fp),
        out_c, out.ctypes.data_as(ctypes.c_void_p),
    )
    if ret != 0:
        return None
    if committed_rng_state is not None:
        rng.bit_generator.state = committed_rng_state
    return out.astype(np.int64) if is_label else out
