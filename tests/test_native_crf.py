"""Native permutohedral lattice + exact dense-CRF backend tests."""

import numpy as np
import pytest

from stego_tpu.native import permutohedral_filter
from stego_tpu.ops.crf_exact import dense_crf_exact


def test_lattice_matches_bruteforce_2d(rng):
    n = 300
    pos = rng.random((n, 2), dtype=np.float32) * 4
    vals = rng.random((n, 3), dtype=np.float32)
    got = permutohedral_filter(pos, vals, normalize=True)
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    k = np.exp(-d2 / 2)
    want = (k @ vals) / k.sum(1, keepdims=True)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.98
    assert np.abs(got - want).mean() < 0.02


def test_lattice_matches_bruteforce_5d(rng):
    n = 300
    pos = rng.random((n, 5), dtype=np.float32) * 3
    vals = rng.random((n, 2), dtype=np.float32)
    got = permutohedral_filter(pos, vals, normalize=True)
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    k = np.exp(-d2 / 2)
    want = (k @ vals) / k.sum(1, keepdims=True)
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.95


def test_lattice_handle_matches_oneshot(rng):
    """The build-once handle ABI (permutohedral_create/apply) must be
    bit-identical to the one-shot filter — same splat/blur/slice code, the
    handle only precomputes the position-dependent structure. Repeated
    applies must not mutate the lattice (the mean-field loop reuses it)."""
    from stego_tpu.native import PermutohedralLattice

    pos = rng.random((500, 5), dtype=np.float32) * 20
    vals = rng.random((500, 4), dtype=np.float32)
    lat = PermutohedralLattice(pos)
    one_shot = permutohedral_filter(pos, vals)
    np.testing.assert_array_equal(lat.apply(vals), one_shot)
    np.testing.assert_array_equal(lat.apply(vals), one_shot)  # no mutation
    # a different value width through the same lattice
    np.testing.assert_array_equal(
        lat.apply(vals[:, :1]), permutohedral_filter(pos, vals[:, :1]))


def test_exact_crf_valid_distribution(rng):
    img = rng.random((24, 24, 3), dtype=np.float32)
    logits = rng.standard_normal((8, 8, 4)).astype(np.float32)
    out = dense_crf_exact(img, logits, n_iter=3)
    assert out.shape == (24, 24, 4)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-4)


def test_exact_crf_aligns_to_color_edges(rng):
    h = w = 40
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = [0.9, 0.1, 0.1]
    img[:, w // 2:] = [0.1, 0.1, 0.9]
    true_label = np.zeros((h, w), np.int64)
    true_label[:, w // 2:] = 1
    logits = np.zeros((h, w, 2), np.float32)
    logits[..., 1] = (true_label * 2 - 1) * 1.0
    logits[..., 0] = -logits[..., 1]
    flip = rng.random((h, w)) < 0.25
    logits[flip] = -logits[flip]

    before = (logits.argmax(-1) == true_label).mean()
    out = dense_crf_exact(img, logits)
    after = (out.argmax(-1) == true_label).mean()
    assert after > before
    assert after > 0.95
