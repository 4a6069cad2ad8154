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


def test_exact_crf_spatial_cache_bit_parity(rng):
    """The per-resolution spatial-lattice cache (round 5) must be
    bit-identical to a fresh build: same positions -> same lattice -> same
    filter outputs, whether cached, fresh, or threaded."""
    from stego_tpu.ops import crf_exact

    h = w = 24
    img1 = rng.random((h, w, 3), dtype=np.float32)
    img2 = rng.random((h, w, 3), dtype=np.float32)
    logits = rng.standard_normal((2, 6, 6, 4)).astype(np.float32)

    crf_exact._SPATIAL_CACHE.clear()
    out_fresh1 = crf_exact.dense_crf_exact(img1, logits[0])
    assert (h, w) in crf_exact._SPATIAL_CACHE
    # second call REUSES the cached lattice — must equal a from-scratch run
    out_cached1 = crf_exact.dense_crf_exact(img1, logits[0])
    np.testing.assert_array_equal(out_fresh1, out_cached1)

    # threaded batch (shared cached spatial kernel) == serial per-image
    out_serial = np.stack([
        crf_exact.dense_crf_exact(img1, logits[0]),
        crf_exact.dense_crf_exact(img2, logits[1]),
    ])
    out_thr = crf_exact.dense_crf_exact_batch(
        np.stack([img1, img2]), logits, n_threads=2)
    np.testing.assert_array_equal(out_serial, out_thr)

    # eviction keeps the cache bounded
    for size in (8, 10, 12, 14, 16):
        crf_exact._spatial_kernel(size, size)
    assert len(crf_exact._SPATIAL_CACHE) <= crf_exact._SPATIAL_CACHE_MAX


def test_exact_crf_multi_matches_standalone(rng):
    """dense_crf_exact_multi (shared bilateral lattice across logit sets)
    must be bit-identical to standalone per-set calls."""
    from stego_tpu.ops.crf_exact import (dense_crf_exact,
                                         dense_crf_exact_batch_multi,
                                         dense_crf_exact_multi)

    h = w = 20
    img = rng.random((h, w, 3), dtype=np.float32)
    la = rng.standard_normal((5, 5, 3)).astype(np.float32)
    lb = rng.standard_normal((5, 5, 6)).astype(np.float32)
    got_a, got_b = dense_crf_exact_multi(img, [la, lb])
    np.testing.assert_array_equal(got_a, dense_crf_exact(img, la))
    np.testing.assert_array_equal(got_b, dense_crf_exact(img, lb))

    imgs = rng.random((2, h, w, 3), dtype=np.float32)
    las = rng.standard_normal((2, 5, 5, 3)).astype(np.float32)
    lbs = rng.standard_normal((2, 5, 5, 6)).astype(np.float32)
    ba, bb = dense_crf_exact_batch_multi(imgs, [las, lbs], n_threads=2)
    for i in range(2):
        np.testing.assert_array_equal(ba[i], dense_crf_exact(imgs[i], las[i]))
        np.testing.assert_array_equal(bb[i], dense_crf_exact(imgs[i], lbs[i]))
