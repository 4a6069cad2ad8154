"""Round-trip: export our params to a reference-format .ckpt, re-ingest via
models/convert, compare forwards."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np

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
