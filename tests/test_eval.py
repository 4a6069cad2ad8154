"""Eval/demo tests: orbax checkpoint eval, converted torch .ckpt eval parity,
demo PNG outputs."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from stego_tpu.config import Config
from stego_tpu.data.contrastive import ContrastiveSegDataset
from stego_tpu.data.transforms import get_transform
from stego_tpu.eval.demo import demo
from stego_tpu.eval.evaluate import evaluate, load_model_for_eval
from stego_tpu.models.vit import ViTConfig
from stego_tpu.train.app import train
from stego_tpu.train.knn_app import precompute_knns

from tests.test_integration import TINY_VIT, data_root, make_cfg  # noqa: F401
from tests.test_vit import DEPTH, DIM, HEADS, IMG, PATCH, make_torch_sd


@pytest.fixture
def trained_ckpt(data_root, tmp_path):
    cfg = make_cfg(data_root, tmp_path, max_steps=20, val_freq=10,
                   checkpoint_freq=10)
    precompute_knns(cfg, dataset_names=["directory"], crop_types=[None],
                    vit_cfg=TINY_VIT, res=16, batch_size=8)
    train_metrics = train(cfg, vit_cfg=TINY_VIT)
    return (cfg, os.path.join(cfg.output_root, "checkpoints",
                              "directory_exp1"), train_metrics)


def test_evaluate_orbax_checkpoint(trained_ckpt, data_root):
    cfg, ckpt_dir, train_metrics = trained_ckpt
    eval_cfg = cfg.replace(res=16, run_crf=False, n_images=2,
                           experiment_name="eval_test")
    val_ds = ContrastiveSegDataset(
        pytorch_data_dir=cfg.pytorch_data_dir, dataset_name="directory",
        crop_type=None, image_set="val",
        transform=get_transform(16, False, "center"),
        target_transform=get_transform(16, True, "center"), cfg=cfg,
    )
    metrics = evaluate(eval_cfg, ckpt_dir, vit_cfg=TINY_VIT,
                       val_dataset=val_ds, save_outputs=True)
    assert "final/cluster/mIoU" in metrics
    assert np.isfinite(metrics["final/cluster/mIoU"])
    # the restored checkpoint must reproduce the training-time validation
    # metrics (flip-TTA shifts results slightly)
    assert abs(metrics["final/cluster/Accuracy"]
               - train_metrics["test/cluster/Accuracy"]) < 15
    assert os.path.exists("results/predictions/eval_test/comparison.png")
    assert os.path.exists("results/predictions/eval_test/conf_matrix.png")


def test_evaluate_with_crf(trained_ckpt):
    cfg, ckpt_dir, _ = trained_ckpt
    eval_cfg = cfg.replace(res=16, run_crf=True, n_images=1)
    val_ds = ContrastiveSegDataset(
        pytorch_data_dir=cfg.pytorch_data_dir, dataset_name="directory",
        crop_type=None, image_set="val",
        transform=get_transform(16, False, "center"),
        target_transform=get_transform(16, True, "center"), cfg=cfg,
    )
    metrics = evaluate(eval_cfg, ckpt_dir, vit_cfg=TINY_VIT,
                       val_dataset=val_ds, save_outputs=False, max_batches=1)
    assert np.isfinite(metrics["final/cluster/mIoU"])


def test_demo_outputs(trained_ckpt, data_root, tmp_path):
    cfg, ckpt_dir, _ = trained_ckpt
    image_dir = os.path.join(data_root, "synth", "imgs", "val")
    result_dir = str(tmp_path / "demo_out")
    n = demo(cfg.replace(res=16, run_crf=False), ckpt_dir, image_dir,
             result_dir, vit_cfg=TINY_VIT)
    assert n == 8
    assert len(os.listdir(os.path.join(result_dir, "cluster"))) == 8
    assert len(os.listdir(os.path.join(result_dir, "linear"))) == 8


def test_load_reference_lightning_ckpt(tmp_path):
    """Build a reference-shaped Lightning .ckpt and check the converted model's
    forward runs and matches a directly assembled JAX model."""
    sd = make_torch_sd()
    full_sd = {("net.model." + k): v for k, v in sd.items()}
    g = torch.Generator().manual_seed(3)
    dim, n_classes = 6, 3
    full_sd.update({
        "net.cluster1.0.weight": torch.randn(dim, DIM, 1, 1, generator=g),
        "net.cluster1.0.bias": torch.randn(dim, generator=g),
        "net.cluster2.0.weight": torch.randn(DIM, DIM, 1, 1, generator=g),
        "net.cluster2.0.bias": torch.randn(DIM, generator=g),
        "net.cluster2.2.weight": torch.randn(dim, DIM, 1, 1, generator=g),
        "net.cluster2.2.bias": torch.randn(dim, generator=g),
        "linear_probe.weight": torch.randn(n_classes, dim, 1, 1, generator=g),
        "linear_probe.bias": torch.randn(n_classes, generator=g),
        "cluster_probe.clusters": torch.randn(n_classes, dim, generator=g),
        "train_cluster_probe.clusters": torch.randn(n_classes, dim,
                                                    generator=g),
        "decoder.weight": torch.randn(DIM, dim, 1, 1, generator=g),
        "decoder.bias": torch.randn(DIM, generator=g),
    })
    ckpt = {
        "state_dict": full_sd,
        "hyper_parameters": {"cfg": {
            "model_type": "vit_small", "dino_patch_size": PATCH, "dim": dim,
            "dataset_name": "directory", "dir_dataset_n_classes": n_classes,
            "projection_type": "nonlinear", "dropout": True,
            "extra_clusters": 0, "continuous": True, "crop_type": None,
            "res": IMG, "backbone_dtype": "float32",
        }},
    }
    path = str(tmp_path / "ref.ckpt")
    torch.save(ckpt, path)

    tiny_cfg = ViTConfig(patch_size=PATCH, embed_dim=DIM, depth=DEPTH,
                         num_heads=HEADS, img_size=IMG)
    seg, backbone, params = load_model_for_eval(path, vit_cfg=tiny_cfg)
    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, IMG, IMG, 3), dtype=np.float32))
    feats, code = seg.net.apply(backbone, params["head"], img, train=False)
    assert code.shape == (2, IMG // PATCH, IMG // PATCH, dim)

    # parity of the head vs direct torch 1x1 convs on the same feats
    feats_t = torch.from_numpy(np.asarray(feats)).permute(0, 3, 1, 2)
    c1 = torch.nn.functional.conv2d(feats_t, full_sd["net.cluster1.0.weight"],
                                    full_sd["net.cluster1.0.bias"])
    h = torch.relu(torch.nn.functional.conv2d(
        feats_t, full_sd["net.cluster2.0.weight"],
        full_sd["net.cluster2.0.bias"]))
    c2 = torch.nn.functional.conv2d(h, full_sd["net.cluster2.2.weight"],
                                    full_sd["net.cluster2.2.bias"])
    want = (c1 + c2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(code), want, rtol=2e-4, atol=2e-5)


def test_potsdam_mosaic_stitching(trained_ckpt):
    """Mosaic path end-to-end on a synthetic 2x2 tile grid."""
    from stego_tpu.eval.analysis import potsdam_mosaic

    cfg, ckpt_dir, _ = trained_ckpt
    rng = np.random.default_rng(0)

    class FakeTiles:
        def __len__(self):
            return 8  # two scenes of 2x2

        def __getitem__(self, i):
            cls = i % 3
            img = np.zeros((16, 16, 3), np.float32)
            img[..., cls] = 1.0
            return {"img": img,
                    "label": np.full((16, 16), cls, np.int64)}

    out = potsdam_mosaic(cfg, ckpt_dir, img_num=1, tile_res=16,
                         vit_cfg=ViTConfig(patch_size=4, embed_dim=32,
                                           depth=2, num_heads=4, img_size=16),
                         dataset=FakeTiles(), grid=2)
    assert out["img"].shape == (32, 32, 3)
    assert out["label"].shape == (32, 32)
    assert out["cluster"].shape == (32, 32)
    # tile (0,0) of scene 1 is dataset index 4 -> class 1: stitching is
    # row-major with tiles laid out (gy, gx)
    assert (out["label"][:16, :16] == 1).all()
    assert os.path.exists("results/predictions/potsdam/cluster/1.png")
