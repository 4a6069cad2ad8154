"""Minimum end-to-end slice (SURVEY.md §7): synthetic directory dataset ->
precompute_knns -> train N steps with validation -> metrics + checkpoints."""

import os

import numpy as np
import pytest
from PIL import Image

from stego_tpu.config import Config
from stego_tpu.models.vit import ViTConfig
from stego_tpu.train.app import train
from stego_tpu.train.knn_app import precompute_knns

TINY_VIT = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                     img_size=16)


@pytest.fixture
def data_root(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "data"
    for split, count in {"train": 16, "val": 8}.items():
        (root / "synth" / "imgs" / split).mkdir(parents=True)
        (root / "synth" / "labels" / split).mkdir(parents=True)
        for i in range(count):
            # structured images so KNN and probes have signal
            base = np.zeros((32, 32, 3), np.uint8)
            cls = i % 3
            base[:, :, cls] = 200
            base += rng.integers(0, 55, (32, 32, 3), dtype=np.uint8)
            lbl = np.full((32, 32), cls, dtype=np.uint8)
            lbl[:4, :4] = 255  # some ignore pixels (mapped via labels as-is)
            Image.fromarray(base).save(
                root / "synth" / "imgs" / split / f"{i:03d}.png")
            Image.fromarray(lbl).save(
                root / "synth" / "labels" / split / f"{i:03d}.png")
    return str(root)


def make_cfg(data_root, tmp_path, **kw):
    defaults = dict(
        output_root=str(tmp_path / "out"),
        pytorch_data_dir=data_root,
        dataset_name="directory",
        dir_dataset_name="synth",
        dir_dataset_n_classes=3,
        res=16, val_res=16, dino_patch_size=4,
        dim=6, feature_samples=4, neg_samples=2,
        batch_size=8, val_batch_size=8,
        max_steps=6, val_freq=3, checkpoint_freq=3, scalar_log_freq=2,
        num_neighbors=4, backbone_dtype="float32",
        crop_type=None, loader_crop_type="center",
        model_type="vit_small",  # only names the KNN cache; vit_cfg overrides
    )
    defaults.update(kw)
    return Config(**defaults)


def test_end_to_end_knn_train_val(data_root, tmp_path):
    cfg = make_cfg(data_root, tmp_path)

    written = precompute_knns(
        cfg, dataset_names=["directory"], crop_types=[None],
        vit_cfg=TINY_VIT, res=16, batch_size=8,
    )
    assert len(written) == 2  # train + val caches
    nns = np.load(written[0])["nns"]
    assert nns.shape[0] == 8  # val first
    # self-similarity puts index 0 as own neighbor
    assert (nns[:, 0] == np.arange(nns.shape[0])).mean() > 0.7

    metrics = train(cfg, vit_cfg=TINY_VIT)
    assert "test/cluster/mIoU" in metrics
    assert "test/linear/Accuracy" in metrics
    for v in metrics.values():
        assert np.isfinite(v)

    ckpt_dir = os.path.join(cfg.output_root, "checkpoints",
                            "directory_exp1")
    assert os.path.exists(os.path.join(ckpt_dir, "config.json"))
    assert os.path.exists(os.path.join(ckpt_dir, "backbone"))
    log_file = os.path.join(cfg.output_root, "logs", "directory_exp1",
                            "metrics.jsonl")
    assert os.path.getsize(log_file) > 0
    # per-validation observability figures (reference logs a prediction panel,
    # a confusion-matrix heatmap, and frequency bars to TB every val epoch —
    # train_segmentation.py:290-359)
    log_dir = os.path.join(cfg.output_root, "logs", "directory_exp1")
    for suffix in ("panel", "confusion", "freqs"):
        assert os.path.exists(os.path.join(log_dir, f"val_6_{suffix}.png")), \
            suffix


def test_end_to_end_einsum_loss(data_root, tmp_path):
    """Train via the einsum-oracle loss end to end (the fused Pallas loss is
    the default as of round 2; this keeps the oracle path integration-covered).
    """
    cfg = make_cfg(data_root, tmp_path, use_pallas_loss=False, max_steps=4,
                   val_freq=4, checkpoint_freq=4,
                   experiment_name="einsum_e2e")
    precompute_knns(cfg, dataset_names=["directory"], crop_types=[None],
                    vit_cfg=TINY_VIT, res=16, batch_size=8)
    metrics = train(cfg, vit_cfg=TINY_VIT)
    for v in metrics.values():
        assert np.isfinite(v)


def test_bf16_trunk_checkpoints_f32_backbone(data_root, tmp_path):
    # Round-5 regression guard: the bf16 trunk's COMPUTE copy stores its
    # block weights in bf16 (models/vit.py:cast_params_for_compute) but the
    # checkpoint artifact must keep the source weights' precision — a
    # bf16-truncated save would silently degrade any later f32-parity use
    # of the checkpoint (train/app.py saves the uncast tree).
    import orbax.checkpoint as ocp

    import jax

    cfg = make_cfg(data_root, tmp_path, backbone_dtype="bfloat16",
                   max_steps=2, val_freq=2, checkpoint_freq=2)
    precompute_knns(cfg, dataset_names=["directory"], crop_types=[None],
                    vit_cfg=TINY_VIT, res=16, batch_size=8)
    train(cfg, vit_cfg=TINY_VIT)
    path = os.path.join(cfg.output_root, "checkpoints", "directory_exp1",
                        "backbone")
    restored = ocp.Checkpointer(ocp.StandardCheckpointHandler()).restore(path)
    dtypes = {str(x.dtype) for x in jax.tree.leaves(restored)}
    assert dtypes == {"float32"}, dtypes


def test_resume_from_checkpoint(data_root, tmp_path):
    """resume=true restores the latest orbax step and continues training from
    there (SURVEY.md §5 checkpoint/resume)."""
    from stego_tpu.train.checkpoint import CheckpointManager

    cfg = make_cfg(data_root, tmp_path, max_steps=4, val_freq=4,
                   checkpoint_freq=2, experiment_name="resume_e2e")
    precompute_knns(cfg, dataset_names=["directory"], crop_types=[None],
                    vit_cfg=TINY_VIT, res=16, batch_size=8)
    train(cfg, vit_cfg=TINY_VIT)
    ckpt_dir = os.path.join(cfg.output_root, "checkpoints",
                            "directory_resume_e2e")
    mgr = CheckpointManager(ckpt_dir, cfg, save_top_k=cfg.save_top_k)
    steps_before = set(mgr.all_steps())
    mgr.close()
    assert 4 in steps_before

    cfg2 = make_cfg(data_root, tmp_path, max_steps=6, val_freq=6,
                    checkpoint_freq=6, experiment_name="resume_e2e",
                    resume=True)
    metrics = train(cfg2, vit_cfg=TINY_VIT)
    for v in metrics.values():
        assert np.isfinite(v)
    mgr = CheckpointManager(ckpt_dir, cfg2, save_top_k=cfg2.save_top_k)
    assert 6 in set(mgr.all_steps())  # continued 4 -> 6, saved at 6
    mgr.close()


def test_end_to_end_feat_cache_matches_uncached(data_root, tmp_path):
    """cache_backbone_feats=true trains the identical trajectory through the
    full app: same KNN caches, same loader seed/shuffle, same pair draws
    (FeatCacheSampler mirrors ContrastiveSegDataset's Generator), same step
    keys — so the final validation metrics must match the uncached run."""
    cfg = make_cfg(data_root, tmp_path, experiment_name="fc_base",
                   max_steps=4, val_freq=4, checkpoint_freq=4)
    precompute_knns(cfg, dataset_names=["directory"], crop_types=[None],
                    vit_cfg=TINY_VIT, res=16, batch_size=8)
    base_metrics = train(cfg, vit_cfg=TINY_VIT)

    cfg_fc = make_cfg(data_root, tmp_path, experiment_name="fc_cached",
                      max_steps=4, val_freq=4, checkpoint_freq=4,
                      cache_backbone_feats=True)
    fc_metrics = train(cfg_fc, vit_cfg=TINY_VIT)

    assert set(base_metrics) == set(fc_metrics)
    for k in base_metrics:
        assert abs(base_metrics[k] - fc_metrics[k]) < 0.5, (
            k, base_metrics[k], fc_metrics[k])

    # multi-step dispatch (steps_per_dispatch=2): the same 4 steps run as two
    # scanned windows — same batches, same fold_in(key, step) sequence, so
    # the final metrics must match the single-dispatch cached run exactly
    cfg_k = make_cfg(data_root, tmp_path, experiment_name="fc_multi",
                     max_steps=4, val_freq=4, checkpoint_freq=4,
                     cache_backbone_feats=True, steps_per_dispatch=2,
                     scalar_log_freq=1)
    k_metrics = train(cfg_k, vit_cfg=TINY_VIT)
    for k in fc_metrics:
        assert abs(fc_metrics[k] - k_metrics[k]) < 1e-6, (
            k, fc_metrics[k], k_metrics[k])
    # interior scalar-log steps were served from the stacked metrics
    log_file = os.path.join(cfg_k.output_root, "logs", "directory_fc_multi",
                            "metrics.jsonl")
    import json

    steps = [json.loads(line)["step"] for line in open(log_file)]
    assert {1, 2, 3, 4}.issubset(set(steps))

    # hist steps force the single-step hist variant out of the window
    # (windows never contain a hist step; _window_clear): a run whose
    # hist_freq collides with the window stride must still match
    cfg_h = make_cfg(data_root, tmp_path, experiment_name="fc_multi_hist",
                     max_steps=4, val_freq=4, checkpoint_freq=4,
                     cache_backbone_feats=True, steps_per_dispatch=2,
                     hist_freq=3)
    h_metrics = train(cfg_h, vit_cfg=TINY_VIT)
    for k in fc_metrics:
        assert abs(fc_metrics[k] - h_metrics[k]) < 1e-6, (
            k, fc_metrics[k], h_metrics[k])
