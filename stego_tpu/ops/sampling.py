"""Bilinear grid sampling with torch ``F.grid_sample`` parity.

The reference's loss pipeline samples feature/code maps at random normalized
coordinates via ``F.grid_sample(t, coords.permute(0,2,1,3), padding_mode='border',
align_corners=True)`` (reference src/modules.py:287-288). We implement the same
semantics as a vectorized gather of the four bilinear corners — a handful of
``take_along_axis`` calls that XLA lowers to dynamic-gathers, with the weighting
fused into surrounding elementwise work. Layout is NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = True,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Sample NHWC ``x`` at normalized grid locations.

    Args:
      x: (B, H, W, C).
      grid: (B, Hg, Wg, 2), last dim is (gx, gy) in [-1, 1]; gx indexes width.
        Matches torch's grid layout.
      align_corners: if True, -1/+1 map to corner pixel centers.
      padding_mode: only "border" (what the reference uses).

    Returns:
      (B, Hg, Wg, C) sampled values.
    """
    if padding_mode != "border":
        raise NotImplementedError("only border padding is supported")
    b, h, w, c = x.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    # border padding: clamp the source coordinate into the valid range
    ix = jnp.clip(ix, 0.0, w - 1)
    iy = jnp.clip(iy, 0.0, h - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    flat = x.reshape(b, h * w, c)
    bg, hg, wg = gx.shape

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(bg, hg * wg)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out.reshape(bg, hg, wg, c)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)

    fx = fx[..., None].astype(x.dtype)
    fy = fy[..., None].astype(x.dtype)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_from_coords(t: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Reference ``modules.sample`` parity (src/modules.py:287-288).

    The reference permutes the coordinate grid's two spatial axes before
    grid_sample; we keep that transpose so fixed-coordinate comparisons agree.

    Args:
      t: (B, H, W, C) feature map (NHWC).
      coords: (B, S1, S2, 2) in [-1, 1], torch (x, y) order.
    Returns:
      (B, S2, S1, C).
    """
    return grid_sample(
        t, jnp.transpose(coords, (0, 2, 1, 3)), align_corners=True,
        padding_mode="border",
    )
