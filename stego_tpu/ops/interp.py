"""Resize ops with exact PyTorch ``F.interpolate`` semantics, built for the MXU.

The reference relies on torch bilinear resize in several parity-critical spots
(logit upsampling, reference src/train_segmentation.py:216,261; code resize,
src/eval_segmentation.py:128) and bicubic for DINO positional-embedding
interpolation (reference src/dino/vision_transformer.py:189-193). Rather than
translating torch's gather-based CUDA kernel, we express separable resize as two
small dense matmuls (out = W_h @ x @ W_w^T): the interpolation weight matrices are
computed **at trace time with numpy** (shapes are static under jit), so the entire
op lowers to MXU-friendly einsums that XLA fuses with neighboring work.

Layout: NHWC (TPU-native). ``resize_nchw`` adapts for callers holding NCHW.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np


def _source_coords(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    """Map output pixel index -> (fractional) input coordinate, torch semantics."""
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            return np.zeros(1, dtype=np.float64)
        return i * (in_size - 1) / (out_size - 1)
    # torch: src = (dst + 0.5) * scale - 0.5, scale = in/out
    return (i + 0.5) * (in_size / out_size) - 0.5


def _linear_weight_matrix(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) bilinear weight matrix matching torch exactly."""
    src = _source_coords(out_size, in_size, align_corners)
    if not align_corners:
        # torch clamps the source coordinate to >= 0 (upsampling edge behavior)
        src = np.clip(src, 0.0, None)
    x0 = np.floor(src).astype(np.int64)
    x0 = np.clip(x0, 0, in_size - 1)
    x1 = np.minimum(x0 + 1, in_size - 1)
    t = src - x0
    t = np.clip(t, 0.0, 1.0)
    w = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(w, (rows, x0), 1.0 - t)
    np.add.at(w, (rows, x1), t)
    return w


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with A=-0.75 (torch's choice)."""
    at = np.abs(t)
    at2, at3 = at * at, at * at * at
    w = np.where(
        at <= 1.0,
        (a + 2.0) * at3 - (a + 3.0) * at2 + 1.0,
        np.where(at < 2.0, a * at3 - 5.0 * a * at2 + 8.0 * a * at - 4.0 * a, 0.0),
    )
    return w


def _cubic_weight_matrix(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) bicubic weight matrix matching torch (A=-0.75)."""
    src = _source_coords(out_size, in_size, align_corners)
    x0 = np.floor(src).astype(np.int64)
    t = src - x0
    w = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    for k in range(-1, 3):
        idx = np.clip(x0 + k, 0, in_size - 1)
        np.add.at(w, (rows, idx), _cubic_kernel(k - t))
    return w


@functools.lru_cache(maxsize=256)
def _weight_matrices(
    in_hw: Tuple[int, int], out_hw: Tuple[int, int], method: str, align_corners: bool
) -> Tuple[np.ndarray, np.ndarray]:
    builder = {
        "bilinear": _linear_weight_matrix,
        "bicubic": _cubic_weight_matrix,
    }[method]
    wh = builder(out_hw[0], in_hw[0], align_corners).astype(np.float32)
    ww = builder(out_hw[1], in_hw[1], align_corners).astype(np.float32)
    return wh, ww


def _nearest_weight_matrix(out_size: int, in_size: int) -> np.ndarray:
    # torch nearest (legacy): src = floor(dst * in/out)
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    idx = np.clip(idx, 0, in_size - 1)
    w = np.zeros((out_size, in_size), dtype=np.float32)
    w[np.arange(out_size), idx] = 1.0
    return w


def interpolate(
    x: jnp.ndarray,
    size: Union[int, Sequence[int]],
    method: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize NHWC tensor ``x`` to ``size`` with torch ``F.interpolate`` parity.

    Args:
      x: (B, H, W, C) array (any float dtype; compute in f32).
      size: int or (out_h, out_w).
      method: "bilinear" | "bicubic" | "nearest".
      align_corners: torch semantics (ignored for nearest).
    """
    if isinstance(size, int):
        out_hw = (size, size)
    else:
        out_hw = (int(size[0]), int(size[1]))
    b, h, w, c = x.shape
    if (h, w) == out_hw:
        return x
    if method == "nearest":
        wh = _nearest_weight_matrix(out_hw[0], h)
        ww = _nearest_weight_matrix(out_hw[1], w)
    else:
        wh, ww = _weight_matrices((h, w), out_hw, method, align_corners)
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    # out[b,i,j,c] = sum_{h,w} WH[i,h] WW[j,w] x[b,h,w,c] — two MXU matmuls.
    # highest precision: interpolation weights are parity-critical and tiny.
    out = jnp.einsum("ih,bhwc->biwc", jnp.asarray(wh), xf, precision="highest")
    out = jnp.einsum("jw,biwc->bijc", jnp.asarray(ww), out, precision="highest")
    return out.astype(orig_dtype)


def resize_nchw(
    x: jnp.ndarray,
    size: Union[int, Sequence[int]],
    method: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """NCHW wrapper mirroring reference ``utils.resize`` (src/utils.py:60-62)."""
    return interpolate(
        jnp.transpose(x, (0, 2, 3, 1)), size, method, align_corners
    ).transpose(0, 3, 1, 2)
