"""Torch-oracle parity tests for stego_tpu.ops.interp."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from stego_tpu.ops.interp import interpolate, resize_nchw


def _torch_resize(x_nchw, size, mode, align_corners):
    t = torch.from_numpy(x_nchw)
    kwargs = {} if mode == "nearest" else {"align_corners": align_corners}
    return F.interpolate(t, size=size, mode=mode, **kwargs).numpy()


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((7, 9), (13, 5)), ((28, 28), (56, 56)), ((16, 16), (11, 23)), ((5, 5), (5, 5))],
)
def test_resize_matches_torch(rng, mode, align_corners, in_hw, out_hw):
    x = rng.standard_normal((2, 3, *in_hw), dtype=np.float32)
    want = _torch_resize(x, out_hw, mode, align_corners)
    got = np.asarray(resize_nchw(x, out_hw, method=mode, align_corners=align_corners))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_nearest_matches_torch(rng):
    x = rng.standard_normal((2, 3, 10, 14), dtype=np.float32)
    want = _torch_resize(x, (7, 21), "nearest", None)
    got = np.asarray(resize_nchw(x, (7, 21), method="nearest"))
    np.testing.assert_allclose(got, want)


def test_nhwc_layout(rng):
    x = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    got = np.asarray(interpolate(x, (16, 16), "bilinear", align_corners=False))
    want = _torch_resize(
        np.transpose(x, (0, 3, 1, 2)), (16, 16), "bilinear", False
    ).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_scale_factor_style_upsample(rng):
    # DINO pos-embed interpolation path: bicubic, align_corners=False,
    # non-integer effective scale (vision_transformer.py:189-193).
    x = rng.standard_normal((1, 384, 28, 28), dtype=np.float32)
    out = (37, 29)
    want = _torch_resize(x, out, "bicubic", False)
    got = np.asarray(resize_nchw(x, out, method="bicubic", align_corners=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
