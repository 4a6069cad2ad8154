"""Torch-oracle parity tests for grid sampling (reference modules.sample)."""

import numpy as np
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
