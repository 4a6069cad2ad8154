"""Fused in-kernel-sampling correlation loss vs the einsum/matmul oracles.

The round-4 kernel (ops/pallas_corr_fused_sampling.py) folds bilinear
coordinate sampling + post-sample l2-normalize + the three-pair correlation
loss into one forward + one backward Pallas launch. These tests run it in
interpreter mode against (a) the full einsum oracle
(ops/correlation.py:contrastive_correlation_loss) and (b) the round-3
matmul-sampled Pallas path, sharing the coordinate draw via the key so all
paths see identical coordinates/permutations.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from stego_tpu.ops.correlation import (CorrLossCfg,
                                       contrastive_correlation_loss)
from stego_tpu.ops.pallas_corr import contrastive_correlation_loss_fused

KEYS = ("pos_intra_loss", "pos_inter_loss", "neg_inter_loss",
        "pos_intra_cd", "pos_inter_cd", "neg_inter_cd")


def _data(key, b=4, h=8, w=8, cf=12, cc=7):
    k1, k2, k3, k4 = jr.split(key, 4)
    return (
        jr.normal(k1, (b, h, w, cf)),
        jr.normal(k2, (b, h, w, cf)),
        jr.normal(k3, (b, h, w, cc)),
        jr.normal(k4, (b, h, w, cc)),
    )


def _cfg(**kw):
    kw.setdefault("feature_samples", 3)
    kw.setdefault("neg_samples", 2)
    return CorrLossCfg(**kw)


def _run(impl, cfg, key, tensors, feat_dtype=jnp.float32):
    return contrastive_correlation_loss_fused(
        cfg, key, *tensors, interpret=True, sampling_impl=impl,
        feat_dtype=feat_dtype)


@pytest.mark.parametrize("pointwise", [True, False])
@pytest.mark.parametrize("zero_clamp", [True, False])
@pytest.mark.parametrize("stabalize", [True, False])
def test_fused_sampling_forward_matches_oracle(pointwise, zero_clamp,
                                               stabalize):
    tensors = _data(jr.PRNGKey(0))
    cfg = _cfg(pointwise=pointwise, zero_clamp=zero_clamp,
               stabalize=stabalize)
    key = jr.PRNGKey(3)
    # two baselines: the round-3 matmul-sampled fused path shares the
    # closed-form finalize (agreement to f32 reassociation, ~1e-7); the
    # einsum oracle computes the pointwise terms directly, which differs
    # from ANY closed-form path by up to ~3e-4 rel in f32 (measured — the
    # round-3 kernel shows the identical delta), so it gets a looser band
    want_r3 = _run("matmul", cfg, key, tensors)
    want_or = contrastive_correlation_loss(cfg, key, *tensors,
                                           sampling_impl="matmul")
    got = _run("fused", cfg, key, tensors)
    for k in KEYS:
        np.testing.assert_allclose(float(got[k]), float(want_r3[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
        np.testing.assert_allclose(float(got[k]),
                                   float(jnp.mean(want_or[k])), rtol=1e-3,
                                   atol=5e-5, err_msg=k)


@pytest.mark.parametrize("neg_samples", [0, 2])
def test_fused_sampling_grads_match_oracle(neg_samples):
    tensors = _data(jr.PRNGKey(1))
    f1, f2, c1, c2 = tensors
    cfg = _cfg(neg_samples=neg_samples)
    key = jr.PRNGKey(9)

    def total(out):
        return (out["pos_intra_loss"] + out["pos_inter_loss"]
                + jnp.mean(out["neg_inter_loss"]))

    def loss_r3(c1, c2):
        return total(_run("matmul", cfg, key, (f1, f2, c1, c2)))

    def loss_fused(c1, c2):
        return total(_run("fused", cfg, key, (f1, f2, c1, c2)))

    def loss_oracle(c1, c2):
        return total(contrastive_correlation_loss(cfg, key, f1, f2, c1, c2,
                                                  sampling_impl="matmul"))

    gw = jax.grad(loss_r3, argnums=(0, 1))(c1, c2)
    gg = jax.grad(loss_fused, argnums=(0, 1))(c1, c2)
    go = jax.grad(loss_oracle, argnums=(0, 1))(c1, c2)
    for a, b, o, name in zip(gw, gg, go, ("dcode", "dcode_pos")):
        assert b.dtype == jnp.float32
        # exact contract: the round-3 Pallas path (same math, ~1e-9)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5,
                                   atol=1e-7, err_msg=name)
        # sanity vs the autodiffed einsum oracle (different reduction
        # orders; see the forward test's tolerance note)
        np.testing.assert_allclose(np.asarray(b), np.asarray(o), rtol=1e-3,
                                   atol=1e-5, err_msg=name)


def test_fused_sampling_feats_get_zero_grads():
    tensors = _data(jr.PRNGKey(2))
    f1, f2, c1, c2 = tensors
    cfg = _cfg()
    key = jr.PRNGKey(4)

    def loss_wrt_feats(f1, f2):
        out = _run("fused", cfg, key, (f1, f2, c1, c2))
        return out["pos_intra_loss"] + out["pos_inter_loss"]

    g1, g2 = jax.grad(loss_wrt_feats, argnums=(0, 1))(f1, f2)
    assert float(jnp.abs(g1).max()) == 0.0
    assert float(jnp.abs(g2).max()) == 0.0


def test_fused_sampling_bf16_feats_match_matmul_path():
    """With bf16 FEATURE INPUTS (the production case: a bf16 trunk) both
    paths round identically at every step (bf16 sampling dot -> bf16
    round-trip -> f32 normalize -> bf16 fd dots), so the losses agree to f32
    reassociation. (With f32 inputs the paths differ by design: the XLA
    sampler samples in the input dtype, the fused kernel in feat_dtype.)"""
    tensors = _data(jr.PRNGKey(5), b=2)
    tensors = (tensors[0].astype(jnp.bfloat16),
               tensors[1].astype(jnp.bfloat16), tensors[2], tensors[3])
    cfg = _cfg()
    key = jr.PRNGKey(6)
    want = _run("matmul", cfg, key, tensors, feat_dtype=jnp.bfloat16)
    got = _run("fused", cfg, key, tensors, feat_dtype=jnp.bfloat16)
    for k in KEYS:
        np.testing.assert_allclose(
            float(jnp.mean(got[k])), float(jnp.mean(want[k])), rtol=5e-5,
            atol=1e-6, err_msg=k)


def test_fused_sampling_salience_coords():
    """Salience only biases the coordinate draw — shared with the oracle via
    the key, so the salience path agrees too."""
    tensors = _data(jr.PRNGKey(7))
    b, h, w = tensors[0].shape[:3]
    cfg = _cfg(use_salience=True)
    key = jr.PRNGKey(8)
    sal = (jr.uniform(jr.PRNGKey(11), (b, h, w)) > 0.4).astype(jnp.float32)
    salp = (jr.uniform(jr.PRNGKey(12), (b, h, w)) > 0.4).astype(jnp.float32)
    want = contrastive_correlation_loss_fused(
        cfg, key, *tensors, sal, salp, interpret=True,
        sampling_impl="matmul")
    got = contrastive_correlation_loss_fused(
        cfg, key, *tensors, sal, salp, interpret=True,
        sampling_impl="fused")
    for k in ("pos_intra_loss", "pos_inter_loss", "neg_inter_loss"):
        np.testing.assert_allclose(float(got[k]), float(want[k]), rtol=2e-5,
                                   atol=1e-6, err_msg=k)


def test_fused_sampling_hist_cd_tensors():
    tensors = _data(jr.PRNGKey(13))
    cfg = _cfg()
    key = jr.PRNGKey(14)
    want = contrastive_correlation_loss(cfg, key, *tensors)
    got = contrastive_correlation_loss_fused(
        cfg, key, *tensors, interpret=True, sampling_impl="fused",
        return_cd_tensors=True)
    for k in ("pos_intra_cd", "pos_inter_cd", "neg_inter_cd"):
        assert got[k].ndim > 0, k
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_cached_step_fused_matches_matmul_path():
    """make_cached_train_step with fused_sampling='on' produces the same
    state trajectory as the round-3 matmul path (tolerance: different dot
    orders, identical math)."""
    from stego_tpu.config import Config
    from stego_tpu.models.vit import ViTConfig
    from stego_tpu.train.segmenter import (UnsupervisedSegmenter,
                                           make_cached_train_step)

    tiny_vit = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                         img_size=16)

    def build(fused):
        cfg = Config(dataset_name="directory", dir_dataset_name="synthetic",
                     res=16, dim=6, feature_samples=3, neg_samples=2,
                     batch_size=4, backbone_dtype="float32", crop_type=None,
                     fused_sampling="on" if fused else "off")
        seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg, vit_cfg=tiny_vit)
        return seg, make_cached_train_step(seg, with_hist=False)

    key = jr.PRNGKey(0)
    hp = 4
    cache = {
        "feats": jr.normal(jr.PRNGKey(1), (8, hp, hp, 32)),
        "label": jr.randint(jr.PRNGKey(2), (8, 16, 16), -1, 3, jnp.int16),
    }
    batch = {
        "ind": jnp.asarray([0, 3, 5, 7], jnp.int32),
        "ind_pos": jnp.asarray([1, 2, 6, 4], jnp.int32),
    }

    states, metrics = [], []
    for fused in (False, True):
        seg, step = build(fused)
        st = seg.init_state(jr.PRNGKey(5))
        for i in range(3):
            st, m = jax.jit(step)(cache, st, batch, jr.fold_in(key, i))
        states.append(st)
        metrics.append(m)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64), rtol=2e-4,
            atol=1e-5),
        states[0]["params"], states[1]["params"])
    for k in ("loss/total", "loss/linear", "loss/cluster"):
        np.testing.assert_allclose(float(metrics[0][k]),
                                   float(metrics[1][k]), rtol=2e-4,
                                   atol=1e-5, err_msg=k)


def test_image_step_fused_matches_gather_path():
    """make_train_step with fused_sampling='on' produces the same state
    trajectory as the round-3 gather path (round 4 extended the fused
    dispatch to the image step via _resolve_corr_sampling). Also covers the
    aug-alignment interplay: the aug resample must stay a plain grid_sample
    when the corr loss goes fused."""
    from stego_tpu.config import Config
    from stego_tpu.models.vit import ViTConfig, init_vit_params
    from stego_tpu.train.segmenter import (UnsupervisedSegmenter,
                                           make_train_step)

    tiny_vit = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                         img_size=16)
    backbone = init_vit_params(jr.PRNGKey(0), tiny_vit)
    b, res = 4, 16
    kb = jr.PRNGKey(7)
    batch = {
        "img": jr.normal(jr.fold_in(kb, 0), (b, res, res, 3)),
        "img_pos": jr.normal(jr.fold_in(kb, 1), (b, res, res, 3)),
        "label": jr.randint(jr.fold_in(kb, 2), (b, res, res), -1, 3),
        "label_pos": jr.randint(jr.fold_in(kb, 3), (b, res, res), -1, 3),
    }

    states, metrics = [], []
    for fused in (False, True):
        cfg = Config(dataset_name="directory", dir_dataset_name="synthetic",
                     res=res, dim=6, feature_samples=3, neg_samples=2,
                     batch_size=b, backbone_dtype="float32", crop_type=None,
                     fused_sampling="on" if fused else "off")
        seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg, vit_cfg=tiny_vit)
        step = jax.jit(make_train_step(seg, with_hist=False))
        st = seg.init_state(jr.PRNGKey(5))
        for i in range(3):
            st, m = step(backbone, st, batch, jr.PRNGKey(100 + i))
        states.append(st)
        metrics.append(m)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b_, np.float64), rtol=2e-4,
            atol=1e-5),
        states[0]["params"], states[1]["params"])
    for k in ("loss/total", "loss/linear", "loss/cluster"):
        np.testing.assert_allclose(float(metrics[0][k]),
                                   float(metrics[1][k]), rtol=2e-4,
                                   atol=1e-5, err_msg=k)


# ----------------------------------------------------------------------
# round 5: mesh-capable fused sampling via shard-local negatives
# (negatives_scope=local — reference per-process DDP semantics,
# src/modules.py:291-295 under train_segmentation.py:476)


def _mesh8():
    from stego_tpu.parallel.mesh import make_mesh

    return make_mesh()


def test_block_local_perms_match_mesh_semantics():
    """neg_blocks=D draws one independent derangement per contiguous block."""
    from stego_tpu.ops.math import block_local_super_perm, super_perm

    key = jr.PRNGKey(0)
    p = np.asarray(block_local_super_perm(8, key, 4))
    for blk in range(4):
        seg = p[2 * blk:2 * blk + 2]
        assert set(seg) <= {2 * blk, 2 * blk + 1}, (blk, seg)
        assert not np.any(seg == np.arange(2 * blk, 2 * blk + 2)), seg
    # n_blocks=1 is exactly super_perm (same key consumption)
    np.testing.assert_array_equal(
        np.asarray(block_local_super_perm(8, key, 1)),
        np.asarray(super_perm(8, key)))


def test_block_local_perm_rejects_single_image_shards():
    """Blocks of one image have no derangement — super_perm(1) is the
    identity, so every negative would be the anchor itself and the
    neg_inter loss silently degrades. Must fail loudly instead (e.g.
    batch 8 over an 8-device mesh under negatives_scope=local)."""
    from stego_tpu.ops.math import block_local_super_perm

    with pytest.raises(ValueError, match="2 images per shard"):
        block_local_super_perm(8, jr.PRNGKey(0), 8)


def test_fused_sampling_mesh_matches_per_shard_oracle(cpu_devices):
    """Fused-sampling kernel on an 8-device mesh (shard_map: local negative
    indices, per-shard pointwise fd means — the reference's per-process DDP
    semantics) == the single-device STREAMED path under the same semantics
    (neg_blocks=8: block-diagonal perms + split finalize groups), which is
    itself checked against the per-block einsum oracle."""
    from stego_tpu.parallel.mesh import batch_sharding

    mesh = _mesh8()
    bs = batch_sharding(mesh)
    tensors = _data(jr.PRNGKey(21), b=16)  # 2 imgs/shard: real derangements
    cfg = _cfg(neg_blocks=8)
    key = jr.PRNGKey(22)

    def total(impl, mesh_, tensors_):
        f1, f2, c1, c2 = tensors_

        def fn(c1, c2):
            out = contrastive_correlation_loss_fused(
                cfg, key, f1, f2, c1, c2, interpret=True,
                sampling_impl=impl, mesh=mesh_)
            return (out["pos_intra_loss"] + out["pos_inter_loss"]
                    + jnp.mean(out["neg_inter_loss"]))

        loss = jax.jit(fn)(c1, c2)
        grads = jax.jit(jax.grad(fn, argnums=(0, 1)))(c1, c2)
        return loss, grads

    # per-shard oracle: streamed path, single device, block semantics
    l1, g1 = total("matmul", None, tensors)
    sh = [jax.device_put(t, bs) for t in tensors]
    l2, g2 = total("fused", mesh, sh)
    np.testing.assert_allclose(float(l2), float(l1), rtol=2e-5, atol=1e-6)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=1e-5,
                                   atol=1e-6)

    # the streamed matmul path ON the mesh agrees too (same key -> same
    # block-diagonal perms; split finalize groups)
    l3, g3 = total("matmul", mesh, sh)
    np.testing.assert_allclose(float(l2), float(l3), rtol=2e-5, atol=1e-6)
    for a, b_ in zip(g3, g2):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=1e-5,
                                   atol=1e-6)

    # and the per-block einsum oracle (looser band: direct pointwise math vs
    # the closed-form finalize; see the forward test's tolerance note)
    f1, f2, c1, c2 = tensors

    def oracle(c1, c2):
        out = contrastive_correlation_loss(cfg, key, f1, f2, c1, c2,
                                           sampling_impl="matmul")
        return (out["pos_intra_loss"] + out["pos_inter_loss"]
                + jnp.mean(out["neg_inter_loss"]))

    lo = jax.jit(oracle)(c1, c2)
    np.testing.assert_allclose(float(l2), float(lo), rtol=1e-3, atol=5e-5)
    go = jax.jit(jax.grad(oracle, argnums=(0, 1)))(c1, c2)
    for a, b_ in zip(go, g2):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=1e-3,
                                   atol=1e-5)


def test_fused_sampling_mesh_global_negatives_raise(cpu_devices):
    """Global perms on a >1-device mesh must fail loudly, not compute
    garbage (round-4 advisor finding + VERDICT r4 weak #1)."""
    mesh = _mesh8()
    tensors = _data(jr.PRNGKey(23), b=8)
    cfg = _cfg()  # neg_blocks=1 (global)
    with pytest.raises(ValueError, match="shard-local negatives"):
        contrastive_correlation_loss_fused(
            cfg, jr.PRNGKey(24), *tensors, interpret=True,
            sampling_impl="fused", mesh=mesh)


def test_fused_sampling_code_bf16_rejected():
    """pallas_loss_bf16 is not silently ignored by the fused path (round-4
    advisor finding): direct misuse raises; the segmenter routes bf16 runs
    to the streamed path instead (_resolve_corr_sampling)."""
    tensors = _data(jr.PRNGKey(25))
    with pytest.raises(ValueError, match="pallas_loss_bf16"):
        contrastive_correlation_loss_fused(
            _cfg(), jr.PRNGKey(26), *tensors, interpret=True,
            sampling_impl="fused", code_bf16=True)


def test_cached_step_fused_local_negatives_on_mesh(cpu_devices):
    """make_cached_train_step on an 8-device mesh with
    fused_sampling='on' + negatives_scope='local' matches the streamed path
    under the SAME local-negative semantics — the round-4 kernel's wins now
    survive meshes (VERDICT r5 item #1)."""
    from stego_tpu.config import Config
    from stego_tpu.models.vit import ViTConfig
    from stego_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                         replicated_sharding)
    from stego_tpu.train.segmenter import (UnsupervisedSegmenter,
                                           make_cached_train_step)

    mesh = make_mesh()
    tiny_vit = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                         img_size=16)

    def build(fused):
        cfg = Config(dataset_name="directory", dir_dataset_name="synthetic",
                     res=16, dim=6, feature_samples=3, neg_samples=2,
                     batch_size=16, backbone_dtype="float32", crop_type=None,
                     negatives_scope="local",  # 2 imgs/shard on 8 devices
                     fused_sampling="on" if fused else "off")
        seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg, vit_cfg=tiny_vit,
                                    mesh=mesh)
        assert seg.neg_blocks == 8
        return seg, make_cached_train_step(seg, with_hist=False)

    key = jr.PRNGKey(0)
    hp = 4
    bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)
    cache = {
        "feats": jax.device_put(jr.normal(jr.PRNGKey(1), (32, hp, hp, 32)),
                                rsh),
        "label": jax.device_put(
            jr.randint(jr.PRNGKey(2), (32, 16, 16), -1, 3, jnp.int16), rsh),
    }
    batch = {
        "ind": jax.device_put(jnp.arange(16, dtype=jnp.int32), bsh),
        "ind_pos": jax.device_put(jnp.arange(16, 32, dtype=jnp.int32), bsh),
    }

    states, metrics = [], []
    for fused in (False, True):
        seg, step = build(fused)
        st = jax.device_put(seg.init_state(jr.PRNGKey(5)), rsh)
        for i in range(3):
            st, m = jax.jit(step)(cache, st, batch, jr.fold_in(key, i))
        states.append(st)
        metrics.append(m)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64), rtol=2e-4,
            atol=1e-5),
        states[0]["params"], states[1]["params"])
    for k in ("loss/total", "loss/linear", "loss/cluster"):
        np.testing.assert_allclose(float(metrics[0][k]),
                                   float(metrics[1][k]), rtol=2e-4,
                                   atol=1e-5, err_msg=k)


def test_local_vs_global_scope_single_device_identical():
    """On one device negatives_scope is a no-op: neg_blocks stays 1 either
    way, so local-scope configs change nothing single-chip."""
    from stego_tpu.config import Config
    from stego_tpu.models.vit import ViTConfig
    from stego_tpu.train.segmenter import UnsupervisedSegmenter

    tiny_vit = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                         img_size=16)
    for scope in ("global", "local"):
        cfg = Config(dataset_name="directory", dir_dataset_name="synthetic",
                     res=16, dim=6, negatives_scope=scope, crop_type=None)
        seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg, vit_cfg=tiny_vit)
        assert seg.neg_blocks == 1
