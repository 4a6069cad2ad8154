"""Bilinear grid sampling with torch ``F.grid_sample`` parity.

The reference's loss pipeline samples feature/code maps at random normalized
coordinates via ``F.grid_sample(t, coords.permute(0,2,1,3), padding_mode='border',
align_corners=True)`` (reference src/modules.py:287-288). Two implementations
of the same semantics:

* ``gather``: the four bilinear corners via ``take_along_axis`` dynamic
  gathers — the obvious form, and the fast one on CPU.
* ``matmul``: build the (B, S, H*W) bilinear weight matrix (≤4 nonzeros per
  row as a product of one-hot row/col weights) and contract it with the
  flattened map on the MXU. TPU dynamic-gathers serialize — the gather form
  (plus its scatter-add backward) measured ~1.7 ms of the sampled
  correlation loss's ~1.9 ms forward at the train footprint, while the
  matmul form's FLOPs (B·S·HW·C) are noise at MXU rates. ``auto`` picks
  matmul on TPU when the weight matrix is small enough to be free
  (S·HW ≤ 2M per batch element), gather otherwise.

Layout is NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# per-batch-element weight-matrix budget for auto-dispatch: covers the
# sampled loss (121x784) and device-aug resample at code res (784x784);
# falls back to gathers for full-image grids (e.g. 3136x3136 at res 448)
_MATMUL_MAX_ELEMS = 2_000_000


def _corner_weights(x_shape, grid, align_corners):
    """Shared corner/fraction math: (y0, y1, x0, x1, fy, fx) with border
    clamping, all shaped like the grid's spatial dims."""
    b, h, w, c = x_shape
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
    return y0, y1, x0, x1, fy, fx


def _grid_sample_gather(x, grid, align_corners):
    b, h, w, c = x.shape
    y0, y1, x0, x1, fy, fx = _corner_weights(x.shape, grid, align_corners)
    flat = x.reshape(b, h * w, c)
    bg, hg, wg = grid.shape[:3]

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


def bilinear_sample_weights(hw, grid, align_corners: bool = True):
    """(B, Hg·Wg, H·W) bilinear weight matrix for :func:`_grid_sample_matmul`.

    Row s is the outer product of a ≤2-nonzero row weight
    ((yy==y0)·(1−fy) + (yy==y1)·fy) and the matching column weight — on
    border clamps (y0==y1) the two terms land on the same entry and sum to 1
    exactly, matching the gather form's degenerate lerp. Exposed so callers
    that sample several tensors at the SAME coordinates (the correlation
    loss samples feats+code ×(2+neg) pair members) build the matrix once.
    """
    h, w = int(hw[0]), int(hw[1])
    y0, y1, x0, x1, fy, fx = _corner_weights((None, h, w, None), grid,
                                             align_corners)
    bg = grid.shape[0]
    s = grid.shape[1] * grid.shape[2]
    y0 = y0.reshape(bg, s, 1)
    y1 = y1.reshape(bg, s, 1)
    x0 = x0.reshape(bg, s, 1)
    x1 = x1.reshape(bg, s, 1)
    fy = fy.reshape(bg, s, 1)
    fx = fx.reshape(bg, s, 1)
    yy = jnp.arange(h, dtype=jnp.int32)
    xx = jnp.arange(w, dtype=jnp.int32)
    wy = jnp.where(yy == y0, 1.0 - fy, 0.0) + jnp.where(yy == y1, fy, 0.0)
    wx = jnp.where(xx == x0, 1.0 - fx, 0.0) + jnp.where(xx == x1, fx, 0.0)
    return (wy[:, :, :, None] * wx[:, :, None, :]).reshape(bg, s, h * w)


def apply_sample_weights(wmat, x, out_hw):
    """Contract a (B, S, N) weight matrix with NHWC ``x`` -> (B, *out_hw, C).

    The weight batch may be a multiple of x's batch (stacked negatives): x is
    tiled along batch to match.
    """
    b, h, w, c = x.shape
    flat = x.reshape(b, h * w, c)
    if wmat.shape[0] != b:
        reps = wmat.shape[0] // b
        flat = jnp.tile(flat, (reps, 1, 1))
    out = jax.lax.dot_general(
        wmat.astype(x.dtype), flat, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return out.reshape(wmat.shape[0], out_hw[0], out_hw[1], c)


def _grid_sample_matmul(x, grid, align_corners):
    """Identical bilinear semantics as one MXU contraction (see
    :func:`bilinear_sample_weights`)."""
    wmat = bilinear_sample_weights(x.shape[1:3], grid, align_corners)
    return apply_sample_weights(wmat, x, grid.shape[1:3])


def grid_sample(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = True,
    padding_mode: str = "border",
    impl: str = "auto",
) -> jnp.ndarray:
    """Sample NHWC ``x`` at normalized grid locations.

    Args:
      x: (B, H, W, C).
      grid: (B, Hg, Wg, 2), last dim is (gx, gy) in [-1, 1]; gx indexes width.
        Matches torch's grid layout.
      align_corners: if True, -1/+1 map to corner pixel centers.
      padding_mode: only "border" (what the reference uses).
      impl: "gather", "matmul", or "auto" (matmul on TPU for small weight
        matrices — see module docstring).

    Returns:
      (B, Hg, Wg, C) sampled values.
    """
    if padding_mode != "border":
        raise NotImplementedError("only border padding is supported")
    impl = resolve_sampling_impl(x.shape[1:3], grid.shape[1:3], impl)
    if impl == "matmul":
        return _grid_sample_matmul(x, grid, align_corners)
    return _grid_sample_gather(x, grid, align_corners)


def resolve_sampling_impl(hw, grid_hw, impl: str = "auto") -> str:
    """Resolve "auto" to "matmul"/"gather" (see module docstring)."""
    if impl != "auto":
        return impl
    s = grid_hw[0] * grid_hw[1]
    on_tpu = jax.default_backend() == "tpu"
    return ("matmul" if on_tpu and s * hw[0] * hw[1] <= _MATMUL_MAX_ELEMS
            else "gather")


def sample_from_coords(t: jnp.ndarray, coords: jnp.ndarray,
                       impl: str = "auto") -> jnp.ndarray:
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
        padding_mode="border", impl=impl,
    )
