"""End-to-end train-step tests on a tiny model, incl. the 8-virtual-device
sharded run vs single-device parity (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from stego_tpu.config import Config
from stego_tpu.models.vit import ViTConfig, init_vit_params
from stego_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from stego_tpu.train.segmenter import (
    UnsupervisedSegmenter,
    make_train_step,
    make_val_step,
    masked_cross_entropy,
)

TINY_VIT = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4, img_size=16)


def tiny_setup(**overrides):
    cfg = Config(
        dataset_name="directory", dir_dataset_name="synthetic", res=16,
        dim=6, feature_samples=4, neg_samples=2, batch_size=8,
        backbone_dtype="float32", crop_type=None, **overrides,
    )
    seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg, vit_cfg=TINY_VIT)
    backbone = init_vit_params(jr.PRNGKey(0), TINY_VIT)
    state = seg.init_state(jr.PRNGKey(1))
    return cfg, seg, backbone, state


def synthetic_batch(key, b=8, res=16, n_classes=3):
    k1, k2, k3 = jr.split(key, 3)
    img = jr.normal(k1, (b, res, res, 3))
    label = jr.randint(k2, (b, res, res), -1, n_classes)
    img_pos = img + 0.05 * jr.normal(k3, (b, res, res, 3))
    return {
        "img": img, "label": label,
        "img_pos": img_pos, "label_pos": label,
        "mask": (label > 0).astype(jnp.float32),
        "mask_pos": (label > 0).astype(jnp.float32),
    }


def test_train_step_runs_and_loss_decreases():
    cfg, seg, backbone, state = tiny_setup()
    step = jax.jit(make_train_step(seg))
    batch = synthetic_batch(jr.PRNGKey(2))
    losses = []
    for i in range(30):
        state, metrics = step(backbone, state, batch, jr.PRNGKey(100 + i))
        losses.append(float(metrics["loss/total"]))
    assert int(state["step"]) == 30
    assert np.isfinite(losses).all()
    # training on a fixed batch must reduce the loss substantially
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_train_step_sharded_matches_single_device(cpu_devices):
    cfg, seg, backbone, state = tiny_setup()
    batch = synthetic_batch(jr.PRNGKey(2))
    key = jr.PRNGKey(3)

    train_step = make_train_step(seg)
    # single device
    s1, m1 = jax.jit(train_step)(backbone, state, batch, key)

    # 8-device data mesh
    mesh = make_mesh()
    bs = batch_sharding(mesh)
    rs = replicated_sharding(mesh)
    sharded_batch = jax.tree.map(lambda a: jax.device_put(a, bs), batch)
    sharded_state = jax.tree.map(lambda a: jax.device_put(a, rs), state)
    sharded_backbone = jax.tree.map(lambda a: jax.device_put(a, rs), backbone)
    s8, m8 = jax.jit(train_step)(sharded_backbone, sharded_state, sharded_batch,
                                 key)

    for k in m1:
        if k.startswith("hist/"):
            # bin-edge rounding can move a couple of counts between adjacent
            # bins under different reduction orders
            assert float(np.abs(np.asarray(m1[k]) - np.asarray(m8[k])).sum()) <= 8, k
        else:
            np.testing.assert_allclose(
                np.asarray(m1[k]), np.asarray(m8[k]), rtol=1e-4, atol=1e-5,
                err_msg=k,
            )
    g1 = np.asarray(s1["params"]["head"]["cluster1"]["kernel"])
    g8 = np.asarray(s8["params"]["head"]["cluster1"]["kernel"])
    np.testing.assert_allclose(g1, g8, rtol=1e-4, atol=1e-5)


def test_val_step_confusion_matrices():
    cfg, seg, backbone, state = tiny_setup()
    val_step = jax.jit(make_val_step(seg))
    batch = synthetic_batch(jr.PRNGKey(4))
    out = val_step(backbone, state["params"], batch)
    assert out["conf_linear"].shape == (3, 3)
    assert out["conf_cluster"].shape == (3, 3)
    n_valid = int((np.asarray(batch["label"]) >= 0).sum())
    assert int(np.asarray(out["conf_linear"]).sum()) == n_valid


def test_optional_losses_enabled():
    cfg, seg, backbone, state = tiny_setup(
        rec_weight=0.5, crf_weight=0.1, aug_alignment_weight=0.1, crf_samples=16,
    )
    step = jax.jit(make_train_step(seg))
    batch = synthetic_batch(jr.PRNGKey(5))
    coord = jnp.stack(
        jnp.meshgrid(jnp.linspace(-1, 1, 16), jnp.linspace(-1, 1, 16),
                     indexing="ij"),
        axis=-1,
    )
    batch["img_aug"] = batch["img"]
    batch["coord_aug"] = jnp.broadcast_to(coord[None], (8, 16, 16, 2))
    state, metrics = step(backbone, state, batch, jr.PRNGKey(6))
    for k in ("loss/rec", "loss/crf", "loss/aug_alignment"):
        assert np.isfinite(float(metrics[k])), k
    # identity aug alignment: resampled code == code_aug up to dropout noise,
    # so alignment cosine should be strongly positive (loss negative)
    assert float(metrics["loss/aug_alignment"]) < 0


def test_use_true_labels_signal():
    cfg, seg, backbone, state = tiny_setup(use_true_labels=True)
    step = jax.jit(make_train_step(seg))
    batch = synthetic_batch(jr.PRNGKey(7))
    state, metrics = step(backbone, state, batch, jr.PRNGKey(8))
    assert np.isfinite(float(metrics["loss/total"]))


def test_reset_probes():
    cfg, seg, backbone, state = tiny_setup()
    step = jax.jit(make_train_step(seg))
    batch = synthetic_batch(jr.PRNGKey(9))
    state, _ = step(backbone, state, batch, jr.PRNGKey(10))
    before = np.asarray(state["params"]["linear_probe"]["kernel"]).copy()
    state2 = seg.reset_probes(jr.PRNGKey(11), state)
    after = np.asarray(state2["params"]["linear_probe"]["kernel"])
    assert not np.allclose(before, after)
    # head untouched
    np.testing.assert_array_equal(
        np.asarray(state["params"]["head"]["cluster1"]["kernel"]),
        np.asarray(state2["params"]["head"]["cluster1"]["kernel"]),
    )


def test_masked_cross_entropy_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 5, 5, 4), dtype=np.float32)
    labels = rng.integers(-1, 4, (2, 5, 5))
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels),
        ignore_index=-1,
    ).item()
    got = float(masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 4))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_use_salience_path():
    cfg, seg, backbone, state = tiny_setup(use_salience=True)
    step = jax.jit(make_train_step(seg))
    batch = synthetic_batch(jr.PRNGKey(12))
    state, metrics = step(backbone, state, batch, jr.PRNGKey(13))
    assert np.isfinite(float(metrics["loss/total"]))


def test_val_step_sharded_matches_single(cpu_devices):
    from stego_tpu.parallel.mesh import batch_sharding, make_mesh, \
        replicated_sharding

    cfg, seg, backbone, state = tiny_setup()
    val_step = make_val_step(seg)
    batch = synthetic_batch(jr.PRNGKey(14))
    out1 = jax.jit(val_step)(backbone, state["params"], batch)

    mesh = make_mesh()
    bs, rs = batch_sharding(mesh), replicated_sharding(mesh)
    sharded = {
        "img": jax.device_put(batch["img"], bs),
        "label": jax.device_put(batch["label"], bs),
    }
    out8 = jax.jit(val_step)(
        jax.device_put(backbone, rs), jax.device_put(state["params"], rs),
        sharded,
    )
    # psum'd confusion matrices must equal the single-device matrices
    np.testing.assert_array_equal(np.asarray(out1["conf_cluster"]),
                                  np.asarray(out8["conf_cluster"]))
    np.testing.assert_array_equal(np.asarray(out1["conf_linear"]),
                                  np.asarray(out8["conf_linear"]))


def test_upsampled_masked_ce_matches_torch_and_composition():
    """The fused channel-major upsample+CE (ops/probe_ce.py) must equal both
    the torch oracle (F.interpolate bilinear + F.cross_entropy ignore_index,
    reference train_segmentation.py:210-218) and the previous
    interpolate-then-masked_cross_entropy composition, in f32."""
    import torch

    from stego_tpu.ops.interp import interpolate
    from stego_tpu.ops.probe_ce import upsampled_masked_cross_entropy

    rng = np.random.default_rng(3)
    logits = rng.standard_normal((2, 7, 7, 5), dtype=np.float32)
    labels = rng.integers(-1, 5, (2, 28, 28))

    up_t = torch.nn.functional.interpolate(
        torch.from_numpy(logits).permute(0, 3, 1, 2), size=(28, 28),
        mode="bilinear", align_corners=False,
    )
    want = torch.nn.functional.cross_entropy(
        up_t, torch.from_numpy(labels), ignore_index=-1,
    ).item()

    got = float(upsampled_masked_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), 5,
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    composed = float(masked_cross_entropy(
        interpolate(jnp.asarray(logits), 28, "bilinear", align_corners=False),
        jnp.asarray(labels), 5))
    np.testing.assert_allclose(got, composed, rtol=1e-5)

    # same-resolution fast path (no upsample) degenerates to plain masked CE
    labels_small = rng.integers(-1, 5, (2, 7, 7))
    got_same = float(upsampled_masked_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels_small), 5,
        compute_dtype=jnp.float32))
    plain = float(masked_cross_entropy(jnp.asarray(logits),
                                       jnp.asarray(labels_small), 5))
    np.testing.assert_allclose(got_same, plain, rtol=1e-5)


def test_upsampled_masked_ce_grad_matches_composition():
    """Gradients w.r.t. the code-res logits must match the composition path
    (the train step optimizes the linear probe through this op)."""
    from stego_tpu.ops.interp import interpolate
    from stego_tpu.ops.probe_ce import upsampled_masked_cross_entropy

    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((2, 5, 5, 4), dtype=np.float32))
    labels = jnp.asarray(rng.integers(-1, 4, (2, 15, 15)))

    g_fused = jax.grad(lambda z: upsampled_masked_cross_entropy(
        z, labels, 4, compute_dtype=jnp.float32))(logits)
    g_comp = jax.grad(lambda z: masked_cross_entropy(
        interpolate(z, 15, "bilinear", align_corners=False), labels, 4)
    )(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_comp),
                               rtol=1e-4, atol=1e-6)


def test_upsampled_argmax_equals_interpolate_then_probe():
    """The val/eval fast path (code-res logits -> channel-major upsampled
    argmax) must produce the SAME predictions as the reference composition
    (interpolate code -> probe -> argmax): bilinear resize commutes with the
    affine linear probe, and the cosine-cluster argmax is invariant to the
    per-pixel code norm."""
    from stego_tpu.models.probes import (
        cluster_lookup,
        init_cluster_probe,
        init_linear_probe,
        linear_probe_logits,
    )
    from stego_tpu.ops.interp import interpolate
    from stego_tpu.ops.math import l2_normalize
    from stego_tpu.ops.probe_ce import upsampled_argmax

    rng = np.random.default_rng(7)
    code = jnp.asarray(rng.standard_normal((3, 7, 7, 12), dtype=np.float32))
    lin = init_linear_probe(jr.PRNGKey(0), 12, 5)
    clu = init_cluster_probe(jr.PRNGKey(1), 12, 6)

    code_up = interpolate(code, 28, "bilinear", align_corners=False)
    want_lin = np.asarray(jnp.argmax(linear_probe_logits(lin, code_up), -1))
    _, probs = cluster_lookup(clu, code_up, alpha=None)
    want_clu = np.asarray(jnp.argmax(probs, -1))

    got_lin = np.asarray(upsampled_argmax(
        linear_probe_logits(lin, code), (28, 28)))
    got_clu = np.asarray(upsampled_argmax(
        code @ l2_normalize(clu["clusters"], axis=1).T, (28, 28)))
    np.testing.assert_array_equal(got_lin, want_lin)
    np.testing.assert_array_equal(got_clu, want_clu)


def test_train_step_potsdam_ir_4ch():
    """potsdam_ir=true: 4-channel input through the full step (tiny ViT with
    in_chans widened by the segmenter)."""
    import jax

    from stego_tpu.models.vit import ViTConfig, init_vit_params
    from stego_tpu.train.segmenter import UnsupervisedSegmenter, make_train_step

    tiny = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                     img_size=16, in_chans=4)
    cfg = Config(dataset_name="potsdam", res=16, dim=6, feature_samples=3,
                 neg_samples=1, crop_type=None, backbone_dtype="float32",
                 batch_size=2, potsdam_ir=True)
    seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg, vit_cfg=tiny)
    assert seg.vit_cfg.in_chans == 4
    backbone = init_vit_params(jax.random.PRNGKey(0), tiny)
    state = seg.init_state(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    batch = {
        "img": jax.random.normal(key, (2, 16, 16, 4)),
        "img_pos": jax.random.normal(jax.random.fold_in(key, 1),
                                     (2, 16, 16, 4)),
        "label": jax.random.randint(jax.random.fold_in(key, 2), (2, 16, 16),
                                    -1, 3),
        "label_pos": jax.random.randint(jax.random.fold_in(key, 3),
                                        (2, 16, 16), -1, 3),
    }
    step = jax.jit(make_train_step(seg))
    new_state, metrics = step(backbone, state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss/total"]))
    assert int(new_state["step"]) == 1


def test_train_step_potsdam_ir_with_device_augs():
    """4-channel input + device augs together: color ops on RGB, IR carried
    through the geometric/blur path inside the jitted step."""
    import jax

    from stego_tpu.models.vit import ViTConfig, init_vit_params
    from stego_tpu.train.segmenter import UnsupervisedSegmenter, make_train_step

    tiny = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                     img_size=16, in_chans=4)
    cfg = Config(dataset_name="potsdam", res=16, dim=6, feature_samples=3,
                 neg_samples=1, crop_type=None, backbone_dtype="float32",
                 batch_size=2, potsdam_ir=True, aug_alignment_weight=0.1)
    seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg, vit_cfg=tiny)
    backbone = init_vit_params(jax.random.PRNGKey(0), tiny)
    state = seg.init_state(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    batch = {
        "img": jax.random.normal(key, (2, 16, 16, 4)),
        "img_pos": jax.random.normal(jax.random.fold_in(key, 1),
                                     (2, 16, 16, 4)),
        "label": jax.random.randint(jax.random.fold_in(key, 2), (2, 16, 16),
                                    -1, 3),
        "label_pos": jax.random.randint(jax.random.fold_in(key, 3),
                                        (2, 16, 16), -1, 3),
    }
    step = jax.jit(make_train_step(seg))
    _, metrics = step(backbone, state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss/aug_alignment"]))
    assert float(metrics["loss/aug_alignment"]) < 0


def test_train_step_sharded_device_augs_matches_single(cpu_devices):
    """DDP-equivalence holds with the device-side augmentation in the graph:
    aug parameters come from a replicated key, so the augmented view (and the
    whole loss) is identical under any batch sharding."""
    from stego_tpu.parallel.mesh import batch_sharding, make_mesh, \
        replicated_sharding

    cfg, seg, backbone, state = tiny_setup(aug_alignment_weight=0.1,
                                           device_augs=True)
    batch = synthetic_batch(jr.PRNGKey(20))
    key = jr.PRNGKey(21)
    train_step = make_train_step(seg)
    _, m1 = jax.jit(train_step)(backbone, state, batch, key)

    mesh = make_mesh()
    bs, rs = batch_sharding(mesh), replicated_sharding(mesh)
    _, m8 = jax.jit(train_step)(
        jax.device_put(backbone, rs), jax.device_put(state, rs),
        jax.tree.map(lambda a: jax.device_put(a, bs), batch), key,
    )
    np.testing.assert_allclose(float(m1["loss/aug_alignment"]),
                               float(m8["loss/aug_alignment"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(m1["loss/total"]),
                               float(m8["loss/total"]), rtol=1e-4, atol=1e-5)


def test_no_hist_step_variant_matches_and_drops_hist_keys():
    """make_train_step(with_hist=False) is the production hot step: same
    losses/updates as the hist variant, no hist/ keys, and (fused path) no
    cd-tensor recomputation in the graph."""
    cfg, seg, backbone, state = tiny_setup()
    batch = synthetic_batch(jr.PRNGKey(2))
    step_h = jax.jit(make_train_step(seg, with_hist=True))
    step_n = jax.jit(make_train_step(seg, with_hist=False))
    sh, mh = step_h(backbone, state, batch, jr.PRNGKey(7))
    sn, mn = step_n(backbone, state, batch, jr.PRNGKey(7))
    assert any(k.startswith("hist/") for k in mh)
    assert not any(k.startswith("hist/") for k in mn)
    np.testing.assert_allclose(float(mh["loss/total"]),
                               float(mn["loss/total"]), atol=1e-6)
    for a, b in zip(jax.tree.leaves(sh["params"]), jax.tree.leaves(sn["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
