"""Torch-oracle parity tests for grid sampling (reference modules.sample)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from stego_tpu.ops.sampling import grid_sample, sample_from_coords


def test_grid_sample_matches_torch(rng):
    x = rng.standard_normal((3, 4, 9, 7), dtype=np.float32)  # NCHW for torch
    grid = (rng.random((3, 5, 6, 2), dtype=np.float32) * 2.4 - 1.2).astype(np.float32)
    want = F.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid),
        mode="bilinear", padding_mode="border", align_corners=True,
    ).numpy()
    got = np.asarray(
        grid_sample(np.transpose(x, (0, 2, 3, 1)), grid, align_corners=True)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid_sample_align_corners_false(rng):
    x = rng.standard_normal((2, 2, 6, 6), dtype=np.float32)
    grid = (rng.random((2, 4, 4, 2), dtype=np.float32) * 2 - 1).astype(np.float32)
    want = F.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid),
        mode="bilinear", padding_mode="border", align_corners=False,
    ).numpy()
    got = np.asarray(
        grid_sample(np.transpose(x, (0, 2, 3, 1)), grid, align_corners=False)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align", [True, False])
def test_matmul_impl_matches_gather(rng, align):
    """The MXU (weight-matrix) implementation must reproduce the gather form,
    including out-of-range coords (border clamp => degenerate lerp where both
    one-hot terms land on the same entry and must sum to 1)."""
    x = rng.standard_normal((3, 7, 9, 5), dtype=np.float32)
    grid = (rng.random((3, 6, 4, 2), dtype=np.float32) * 2.6 - 1.3)
    # force exact-corner and clamped rows
    grid[0, 0, 0] = [-1.0, -1.0]
    grid[0, 0, 1] = [1.0, 1.0]
    grid[0, 0, 2] = [2.0, -3.0]
    want = grid_sample(x, grid, align_corners=align, impl="gather")
    got = grid_sample(x, grid, align_corners=align, impl="matmul")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_matmul_impl_gradient_matches_gather(rng):
    """Backward parity: d(sum of samples)/dx — the gather form's scatter-add
    vs the matmul form's transposed contraction."""
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 4), dtype=np.float32))
    grid = jnp.asarray(rng.random((2, 5, 3, 2), dtype=np.float32) * 2.2 - 1.1)
    w = jnp.asarray(rng.standard_normal((2, 5, 3, 4), dtype=np.float32))

    def loss(impl):
        return lambda t: jnp.sum(
            grid_sample(t, grid, impl=impl).astype(jnp.float32) * w)

    g_gather = jax.grad(loss("gather"))(x)
    g_matmul = jax.grad(loss("matmul"))(x)
    np.testing.assert_allclose(np.asarray(g_matmul), np.asarray(g_gather),
                               rtol=1e-5, atol=1e-6)


def test_matmul_impl_bf16(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16),
                                        dtype=np.float32)).astype(jnp.bfloat16)
    grid = jnp.asarray(rng.random((2, 4, 4, 2), dtype=np.float32) * 2 - 1)
    want = grid_sample(x, grid, impl="gather").astype(jnp.float32)
    got = grid_sample(x, grid, impl="matmul").astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_sample_from_coords_matches_reference_sample(rng):
    # Reference sample(): grid_sample(t, coords.permute(0,2,1,3), border,
    # align_corners=True) (src/modules.py:287-288).
    t = rng.standard_normal((2, 6, 28, 28), dtype=np.float32)
    coords = (rng.random((2, 11, 11, 2), dtype=np.float32) * 2 - 1).astype(np.float32)
    want = F.grid_sample(
        torch.from_numpy(t),
        torch.from_numpy(coords).permute(0, 2, 1, 3),
        padding_mode="border", align_corners=True,
    ).numpy()
    got = np.asarray(
        sample_from_coords(np.transpose(t, (0, 2, 3, 1)), coords)
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
