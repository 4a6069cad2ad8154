"""KNN index build unit tests."""

import jax.random as jr
import numpy as np

from stego_tpu.models.featurizer import DinoFeaturizer
from stego_tpu.models.vit import ViTConfig, init_vit_params
from stego_tpu.ops.math import l2_normalize
from stego_tpu.parallel.mesh import make_mesh
from stego_tpu.train.knn import build_knn_cache, make_embed_fn, topk_neighbors


def _feats(n=20, d=16, seed=0):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal((n, d)).astype(np.float32)
    return f / np.linalg.norm(f, axis=1, keepdims=True)


def brute_topk(feats, k):
    sims = feats @ feats.T
    return np.argsort(-sims, axis=1, kind="stable")[:, :k]


def test_topk_matches_bruteforce():
    feats = _feats()
    got = topk_neighbors(feats, k=5, n_chunks=4)
    want = brute_topk(feats, 5)
    # top-1 is self; compare neighbor SETS per row (ties may reorder)
    for i in range(len(feats)):
        assert got[i, 0] == i
        assert set(got[i].tolist()) == set(want[i].tolist())


def test_topk_memory_cap_still_correct():
    feats = _feats(n=50)
    # force 1-row chunks via a tiny byte cap
    got = topk_neighbors(feats, k=4, n_chunks=2, max_sims_bytes=4 * 50)
    want = brute_topk(feats, 4)
    for i in range(len(feats)):
        assert set(got[i].tolist()) == set(want[i].tolist())


def test_topk_sharded_matches_unsharded(cpu_devices):
    feats = _feats(n=40)
    mesh = make_mesh()
    got = topk_neighbors(feats, k=6, n_chunks=2, mesh=mesh)
    want = topk_neighbors(feats, k=6, n_chunks=2)
    for i in range(len(feats)):
        assert set(np.asarray(got)[i].tolist()) == \
            set(np.asarray(want)[i].tolist())


def test_build_knn_cache(tmp_path):
    tiny = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                     img_size=16)
    net = DinoFeaturizer(tiny, dim=8, projection_type=None, use_dropout=False)
    backbone = init_vit_params(jr.PRNGKey(0), tiny)
    batches = [{"img": np.random.default_rng(i).standard_normal(
        (4, 16, 16, 3)).astype(np.float32)} for i in range(3)]
    cache = str(tmp_path / "nns" / "nns_test.npz")
    nns = build_knn_cache(cache, net, backbone, batches, k=5)
    assert nns.shape == (12, 5)
    loaded = np.load(cache)["nns"]
    np.testing.assert_array_equal(nns, loaded)
    # self is the nearest neighbor for a deterministic embedder
    assert (nns[:, 0] == np.arange(12)).mean() > 0.8
