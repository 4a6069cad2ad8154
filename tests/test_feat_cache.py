"""Frozen-backbone feature-cache mode (train/feat_cache.py +
segmenter.make_cached_train_step): step-for-step equivalence with the image
pipeline, pair-draw parity with ContrastiveSegDataset, config guards, and
the 8-device sharded run."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from stego_tpu.config import Config
from stego_tpu.models.vit import ViTConfig, init_vit_params
from stego_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from stego_tpu.train.feat_cache import (
    FeatCacheSampler,
    build_feat_cache,
    estimate_cache_gb,
    validate_feat_cache_cfg,
)
from stego_tpu.train.segmenter import (
    UnsupervisedSegmenter,
    make_cached_train_step,
    make_train_step,
)

TINY_VIT = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                     img_size=16)
N_ITEMS = 12
RES = 16


def tiny_setup(**overrides):
    cfg = Config(
        dataset_name="directory", dir_dataset_name="synthetic", res=RES,
        dim=6, feature_samples=4, neg_samples=2, batch_size=8,
        backbone_dtype="float32", crop_type=None, num_neighbors=3,
        **overrides,
    )
    seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg, vit_cfg=TINY_VIT)
    backbone = init_vit_params(jr.PRNGKey(0), TINY_VIT)
    state = seg.init_state(jr.PRNGKey(1))
    return cfg, seg, backbone, state


class _Base:
    """Deterministic (img, label, mask) tuples, one per index."""

    def __init__(self, n=N_ITEMS):
        rng = np.random.default_rng(0)
        self.items = []
        for _ in range(n):
            img = rng.normal(size=(RES, RES, 3)).astype(np.float32)
            label = rng.integers(-1, 3, size=(RES, RES)).astype(np.int64)
            mask = (label > 0).astype(np.float32)
            self.items.append((img, label, mask))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class _FakeContrastive:
    """The attribute surface build_feat_cache/FeatCacheSampler consume."""

    def __init__(self, seed=0, num_neighbors=3):
        self.dataset = _Base()
        self.seed = seed
        self.epoch = 0
        self.num_neighbors = num_neighbors
        rng = np.random.default_rng(1)
        self.nns = np.stack([
            np.concatenate([[i], rng.permutation(N_ITEMS)[:num_neighbors]])
            for i in range(N_ITEMS)
        ])
        self.pos_images = True
        self.pos_labels = True

    def __len__(self):
        return len(self.dataset)


def _image_batch(ds, ind, ind_pos):
    base = ds.dataset

    def stack(sel, j):
        return np.stack([base[i][j] for i in sel])

    return {
        "img": jnp.asarray(stack(ind, 0)),
        "label": jnp.asarray(stack(ind, 1).astype(np.int32)),
        "img_pos": jnp.asarray(stack(ind_pos, 0)),
        "label_pos": jnp.asarray(stack(ind_pos, 1).astype(np.int32)),
        "mask": jnp.asarray(stack(ind, 2)),
        "mask_pos": jnp.asarray(stack(ind_pos, 2)),
    }


@pytest.mark.parametrize("use_salience", [False, True])
def test_cached_step_matches_image_step(use_salience):
    """Same indices + same key => the cached step reproduces the image step
    (losses and updated params), because both share _update_from_feats and
    the identical 8-way key split."""
    cfg, seg, backbone, state = tiny_setup(use_salience=use_salience)
    ds = _FakeContrastive()
    mesh = make_mesh(1)
    cache = build_feat_cache(seg, backbone, ds, cfg, mesh)

    ind = np.array([3, 0, 7, 5, 11, 2, 9, 4], np.int32)
    ind_pos = np.array([1, 6, 2, 8, 0, 10, 3, 7], np.int32)
    key = jr.PRNGKey(42)

    s_img, m_img = jax.jit(make_train_step(seg))(
        backbone, state, _image_batch(ds, ind, ind_pos), key)
    s_c, m_c = jax.jit(make_cached_train_step(seg))(
        cache, state, {"ind": jnp.asarray(ind), "ind_pos": jnp.asarray(ind_pos)},
        key)

    for k in m_img:
        np.testing.assert_allclose(
            np.asarray(m_img[k]), np.asarray(m_c[k]), rtol=1e-5, atol=1e-6,
            err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        s_img["params"], s_c["params"])


def test_cached_step_sharded_matches_single_device(cpu_devices):
    cfg, seg, backbone, state = tiny_setup()
    ds = _FakeContrastive()
    mesh1 = make_mesh(1)
    cache = build_feat_cache(seg, backbone, ds, cfg, mesh1)
    batch = {"ind": jnp.arange(8, dtype=jnp.int32),
             "ind_pos": jnp.asarray([4, 2, 0, 6, 1, 7, 5, 3], jnp.int32)}
    key = jr.PRNGKey(7)

    step = make_cached_train_step(seg)
    s1, m1 = jax.jit(step)(cache, state, batch, key)

    mesh = make_mesh()
    seg8 = UnsupervisedSegmenter(n_classes=3, cfg=cfg, vit_cfg=TINY_VIT,
                                 mesh=mesh)
    bs, rs = batch_sharding(mesh), replicated_sharding(mesh)
    cache8 = jax.tree.map(lambda a: jax.device_put(a, rs), cache)
    s8, m8 = jax.jit(make_cached_train_step(seg8))(
        cache8,
        jax.tree.map(lambda a: jax.device_put(a, rs), state),
        jax.tree.map(lambda a: jax.device_put(a, bs), batch),
        key)

    for k in m1:
        if k.startswith("hist/"):
            assert float(np.abs(np.asarray(m1[k]) - np.asarray(m8[k])).sum()) <= 8
        else:
            np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m8[k]),
                                       rtol=1e-4, atol=1e-5, err_msg=k)
    np.testing.assert_allclose(
        np.asarray(s1["params"]["head"]["cluster1"]["kernel"]),
        np.asarray(s8["params"]["head"]["cluster1"]["kernel"]),
        rtol=1e-4, atol=1e-5)


def test_sharded_cache_matches_replicated(cpu_devices):
    """feat_cache_sharded=true (rows block-distributed over the mesh,
    gathers via all_gather+reduce_scatter) must reproduce the replicated
    cache exactly — train metrics/params and val confusion matrices,
    including -1 index padding and a row count that needs padding (12 % 8)."""
    from stego_tpu.train.segmenter import make_cached_val_step

    mesh = make_mesh()
    cfg, seg, backbone, state = tiny_setup()
    cfg_s = cfg.replace(feat_cache_sharded=True)
    seg_r = UnsupervisedSegmenter(n_classes=3, cfg=cfg, vit_cfg=TINY_VIT,
                                  mesh=mesh)
    seg_s = UnsupervisedSegmenter(n_classes=3, cfg=cfg_s, vit_cfg=TINY_VIT,
                                  mesh=mesh)
    ds = _FakeContrastive()
    cache_r = build_feat_cache(seg_r, backbone, ds, cfg, mesh)
    cache_s = build_feat_cache(seg_s, backbone, ds, cfg_s, mesh)
    assert cache_s["feats"].shape[0] == 16  # padded 12 -> multiple of 8

    bs, rs = batch_sharding(mesh), replicated_sharding(mesh)
    state8 = jax.tree.map(lambda a: jax.device_put(a, rs), state)
    batch = {"ind": jax.device_put(
                 jnp.asarray([3, 0, 7, 5, 11, 2, 9, 4], jnp.int32), bs),
             "ind_pos": jax.device_put(
                 jnp.asarray([1, 6, 2, 8, 0, 10, 3, 7], jnp.int32), bs)}
    key = jr.PRNGKey(42)
    s_r, m_r = jax.jit(make_cached_train_step(seg_r))(cache_r, state8, batch,
                                                      key)
    s_s, m_s = jax.jit(make_cached_train_step(seg_s))(cache_s, state8, batch,
                                                      key)
    for k in m_r:
        if k.startswith("hist/"):
            continue
        np.testing.assert_allclose(np.asarray(m_r[k]), np.asarray(m_s[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    np.testing.assert_allclose(
        np.asarray(s_r["params"]["head"]["cluster1"]["kernel"]),
        np.asarray(s_s["params"]["head"]["cluster1"]["kernel"]),
        rtol=1e-5, atol=1e-6)

    vb = {"ind": jax.device_put(
        jnp.asarray([4, 6, 11, 0, -1, -1, -1, -1], jnp.int32), bs)}
    out_r = jax.jit(make_cached_val_step(seg_r))(cache_r, state8["params"], vb)
    out_s = jax.jit(make_cached_val_step(seg_s))(cache_s, state8["params"], vb)
    np.testing.assert_array_equal(np.asarray(out_r["conf_linear"]),
                                  np.asarray(out_s["conf_linear"]))
    np.testing.assert_array_equal(np.asarray(out_r["conf_cluster"]),
                                  np.asarray(out_s["conf_cluster"]))


def test_multi_step_matches_single_steps():
    """A K-step window (make_cached_multi_step) must be bitwise-equivalent to
    K single dispatches: same fold_in(key, step) sequence, same state chain,
    and stacked metrics equal to the per-step metrics."""
    from stego_tpu.train.segmenter import make_cached_multi_step

    cfg, seg, backbone, state = tiny_setup()
    ds = _FakeContrastive()
    cache = build_feat_cache(seg, backbone, ds, cfg, make_mesh(1))
    rng = np.random.default_rng(3)
    K, B = 4, 8
    ind = rng.integers(0, N_ITEMS, size=(2 * K, B)).astype(np.int32)
    ind_pos = rng.integers(0, N_ITEMS, size=(2 * K, B)).astype(np.int32)
    base_key = jr.PRNGKey(11)
    start = 5  # arbitrary absolute step offset (resume parity)

    single = jax.jit(make_cached_train_step(seg, with_hist=False))
    s_ref = state
    per_step = []
    for j in range(2 * K):
        s_ref, m = single(cache, s_ref,
                          {"ind": jnp.asarray(ind[j]),
                           "ind_pos": jnp.asarray(ind_pos[j])},
                          jr.fold_in(base_key, start + j))
        per_step.append(m)

    multi = jax.jit(make_cached_multi_step(seg, K))
    s_m = state
    stacks = []
    for w in range(2):
        s_m, ms = multi(cache, s_m,
                        {"ind": jnp.asarray(ind[w * K:(w + 1) * K]),
                         "ind_pos": jnp.asarray(ind_pos[w * K:(w + 1) * K])},
                        base_key, start + w * K)
        stacks.append(ms)

    for w in range(2):
        for j in range(K):
            m_ref = per_step[w * K + j]
            for k in m_ref:
                np.testing.assert_allclose(
                    np.asarray(m_ref[k]), np.asarray(stacks[w][k][j]),
                    rtol=1e-5, atol=1e-6, err_msg=f"window {w} step {j} {k}")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        s_ref["params"], s_m["params"])


def test_steps_per_dispatch_requires_cache():
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        Config(dataset_name="directory", dir_dataset_name="s", res=RES,
               crop_type=None, steps_per_dispatch=4)


def test_sampler_matches_contrastive_pair_draw():
    """FeatCacheSampler must reproduce ContrastiveSegDataset's neighbor
    choice exactly: same (seed, epoch, ind) Generator, same first draw."""
    ds = _FakeContrastive(seed=5)
    sampler = FeatCacheSampler(ds)
    for epoch in (0, 1, 3):
        sampler.epoch = epoch
        for ind in range(N_ITEMS):
            rng = np.random.default_rng((ds.seed, epoch, ind))
            nn_choice = int(rng.integers(1, ds.num_neighbors + 1))
            want = int(ds.nns[ind][nn_choice])
            got = sampler[ind]
            assert int(got["ind"]) == ind
            assert int(got["ind_pos"]) == want


def test_cfg_guards():
    for bad in (dict(loader_crop_type="random"),
                dict(aug_alignment_weight=0.1),
                dict(crf_weight=0.1),
                dict(arch="feature-pyramid", model_type="resnet50")):
        cfg = Config(dataset_name="directory", dir_dataset_name="s", res=RES,
                     crop_type=None, **bad)
        with pytest.raises(ValueError):
            validate_feat_cache_cfg(cfg)
    # the default-ish config passes
    cfg, seg, _, _ = tiny_setup()
    validate_feat_cache_cfg(cfg)


def test_cache_size_guard():
    cfg, seg, backbone, _ = tiny_setup(feat_cache_max_gb=1e-9)
    ds = _FakeContrastive()
    assert estimate_cache_gb(cfg, seg, len(ds)) > 1e-9
    with pytest.raises(ValueError, match="feat_cache_max_gb"):
        build_feat_cache(seg, backbone, ds, cfg, make_mesh(1))


def test_short_final_chunk_padding():
    """N not divisible by the forward batch: the padded final chunk must not
    leak padding rows into the cache."""
    cfg, seg, backbone, _ = tiny_setup()  # batch 8: 12 items -> 8 + 4(pad)
    ds = _FakeContrastive()
    mesh = make_mesh(1)
    cache = build_feat_cache(seg, backbone, ds, cfg, mesh)
    assert cache["feats"].shape[0] == N_ITEMS
    assert cache["label"].shape == (N_ITEMS, RES, RES)
    # last item's features == a direct forward of that image
    direct = seg.net.backbone_features(
        backbone, jnp.asarray(ds.dataset[N_ITEMS - 1][0])[None])
    np.testing.assert_allclose(np.asarray(cache["feats"][-1]),
                               np.asarray(direct[0]), rtol=1e-5, atol=1e-6)


def test_cached_val_step_matches_image_val_step():
    from stego_tpu.train.segmenter import make_cached_val_step, make_val_step

    cfg, seg, backbone, state = tiny_setup()
    ds = _FakeContrastive()
    cache = build_feat_cache(seg, backbone, ds, cfg, make_mesh(1),
                             with_mask=False)
    ind = np.array([0, 3, 5, 7, 2, 9, 11, 1], np.int32)
    base = ds.dataset
    img_batch = {
        "img": jnp.asarray(np.stack([base[i][0] for i in ind])),
        "label": jnp.asarray(np.stack([base[i][1] for i in ind])
                             .astype(np.int32)),
    }
    out_i = jax.jit(make_val_step(seg))(backbone, state["params"], img_batch)
    out_c = jax.jit(make_cached_val_step(seg))(cache, state["params"],
                                               {"ind": jnp.asarray(ind)})
    np.testing.assert_array_equal(np.asarray(out_i["conf_linear"]),
                                  np.asarray(out_c["conf_linear"]))
    np.testing.assert_array_equal(np.asarray(out_i["conf_cluster"]),
                                  np.asarray(out_c["conf_cluster"]))
    np.testing.assert_array_equal(np.asarray(out_i["linear_preds"]),
                                  np.asarray(out_c["linear_preds"]))


def test_cached_val_epoch_matches_batch_loop():
    """One-dispatch epoch (scan over stacked index batches) must produce the
    exact summed confusion matrices of the per-batch loop, incl. -1 padding."""
    from stego_tpu.train.segmenter import (
        make_cached_val_epoch,
        make_cached_val_step,
    )

    cfg, seg, backbone, state = tiny_setup()
    ds = _FakeContrastive()
    cache = build_feat_cache(seg, backbone, ds, cfg, make_mesh(1),
                             with_mask=False)
    inds = np.array([[0, 3, 5, 7, 2, 9, 11, 1],
                     [4, 6, 8, 10, 0, 2, -1, -1]], np.int32)
    step = jax.jit(make_cached_val_step(seg))
    want_l = sum(np.asarray(step(cache, state["params"],
                                 {"ind": jnp.asarray(row)})["conf_linear"])
                 for row in inds)
    want_c = sum(np.asarray(step(cache, state["params"],
                                 {"ind": jnp.asarray(row)})["conf_cluster"])
                 for row in inds)
    out = jax.jit(make_cached_val_epoch(seg))(cache, state["params"],
                                              jnp.asarray(inds))
    np.testing.assert_array_equal(np.asarray(out["conf_linear"]), want_l)
    np.testing.assert_array_equal(np.asarray(out["conf_cluster"]), want_c)


def test_cached_val_step_ignores_padding():
    """ind = -1 (short-final-batch padding) must contribute zero pixels to
    the confusion matrices."""
    from stego_tpu.train.segmenter import make_cached_val_step

    cfg, seg, backbone, state = tiny_setup()
    ds = _FakeContrastive()
    cache = build_feat_cache(seg, backbone, ds, cfg, make_mesh(1),
                             with_mask=False)
    step = jax.jit(make_cached_val_step(seg))
    full = step(cache, state["params"],
                {"ind": jnp.asarray([4, 6, 4, 6, 4, 6, 4, 6], jnp.int32)})
    padded = step(cache, state["params"],
                  {"ind": jnp.asarray([4, 6, -1, -1, -1, -1, -1, -1],
                                      jnp.int32)})
    assert int(np.asarray(padded["conf_linear"]).sum()) * 4 == \
        int(np.asarray(full["conf_linear"]).sum())
