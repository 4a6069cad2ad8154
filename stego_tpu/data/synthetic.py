"""Deterministic synthetic benchmark dataset (accuracy regression gate).

The released STEGO checkpoints and real datasets are unreachable offline
(BASELINE.md), so the accuracy half of the north star needs an offline proxy:
a procedurally generated segmentation task that is HARD ENOUGH that cluster
mIoU lands strictly below 100 (unlike the verify-skill's trivially separable
color blobs), trained to convergence and tracked as a regression number.

Scene recipe (fully determined by ``seed``): a Voronoi mosaic of ``n_classes``
regions, where each class renders as an oriented sinusoidal grating in a
class-tinted palette, corrupted by (a) pixel noise, (b) a random smooth
lighting gradient across the image, and (c) palette jitter per image. Color
alone does not separate classes (tints overlap under jitter + lighting);
texture orientation carries most of the signal, so the probes must use real
spatial features. Labels are exact region ids; a border stripe is marked
ignore (-1 via 255) to exercise masked metrics.

Layout matches DirectoryDataset (reference README.md:109-129):
``<root>/<name>/imgs/{train,val}/*.png`` + ``labels/{train,val}/*.png``.
"""

from __future__ import annotations

import os

import numpy as np

PALETTE = np.array([
    [0.85, 0.35, 0.35],
    [0.35, 0.80, 0.40],
    [0.35, 0.45, 0.85],
    [0.80, 0.75, 0.30],
    [0.70, 0.35, 0.80],
    [0.35, 0.80, 0.80],
], np.float32)


def render_scene(rng: np.random.Generator, res: int, n_classes: int,
                 n_seeds: int = 7):
    """One (image float32 [0,1] (res,res,3), label int64 (res,res)) scene."""
    # Voronoi mosaic over random seed points
    pts = rng.uniform(0, res, size=(n_seeds, 2)).astype(np.float32)
    cls_of_seed = rng.integers(0, n_classes, size=n_seeds)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32)
    d2 = (yy[..., None] - pts[:, 0]) ** 2 + (xx[..., None] - pts[:, 1]) ** 2
    label = cls_of_seed[np.argmin(d2, axis=-1)]

    # class-specific oriented gratings (texture signal)
    img = np.zeros((res, res, 3), np.float32)
    period = res / 8.0
    for c in range(n_classes):
        theta = np.pi * c / n_classes + rng.normal(0, 0.08)
        phase = rng.uniform(0, 2 * np.pi)
        wave = 0.5 + 0.5 * np.sin(
            2 * np.pi * (np.cos(theta) * xx + np.sin(theta) * yy) / period
            + phase)
        tint = PALETTE[c % len(PALETTE)] * (1.0 + rng.normal(0, 0.15, 3))
        img[label == c] = (np.clip(tint, 0.05, 1.0)[None]
                           * (0.35 + 0.65 * wave[label == c, None]))

    # smooth lighting gradient + pixel noise (color unreliability)
    gdir = rng.normal(size=2)
    gdir /= np.linalg.norm(gdir) + 1e-9
    light = 0.75 + 0.5 * (gdir[0] * yy + gdir[1] * xx) / res
    img = img * light[..., None]
    img = img + rng.normal(0, 0.06, img.shape).astype(np.float32)
    img = np.clip(img, 0.0, 1.0)

    label = label.astype(np.int64)
    label[:2, :] = -1  # ignore stripe (masked-metric coverage)
    return img, label


def write_synthetic_benchmark(root: str, name: str = "synthbench",
                              n_train: int = 64, n_val: int = 16,
                              res: int = 96, n_classes: int = 4,
                              seed: int = 0) -> str:
    """Write the dataset if absent; returns the dataset root. Deterministic
    in (seed, sizes): rerunning reproduces identical pixels."""
    from PIL import Image

    base = os.path.join(root, name)
    done = os.path.join(base, ".complete")
    if os.path.exists(done):
        return base
    rng = np.random.default_rng(seed)
    for split, count in (("train", n_train), ("val", n_val)):
        os.makedirs(os.path.join(base, "imgs", split), exist_ok=True)
        os.makedirs(os.path.join(base, "labels", split), exist_ok=True)
        for i in range(count):
            img, label = render_scene(rng, res, n_classes)
            u8 = np.clip(np.rint(img * 255.0), 0, 255).astype(np.uint8)
            lbl = np.where(label < 0, 255, label).astype(np.uint8)
            Image.fromarray(u8).save(
                os.path.join(base, "imgs", split, f"{i:04d}.png"))
            Image.fromarray(lbl).save(
                os.path.join(base, "labels", split, f"{i:04d}.png"))
    with open(done, "w") as f:
        f.write("ok")
    return base


def tiny_benchmark_setup(root: str, *, n_train: int = 32, n_val: int = 8,
                         **config_overrides):
    """The 2-BLOCK sensitive accuracy instrument, in one place.

    Writes the res-64 mosaic under ``root`` and returns ``(cfg, vit_cfg)``
    for the tiny ViT (2 blocks, d=32) + 40-step footprint whose cluster mIoU
    (~22) actually MOVES when numerics move — the suite's regression gate
    (tests/test_accuracy.py), the chip-stack sensitive row
    (scripts/accuracy_bench.py) and the negatives-scope A/B
    (scripts/ab_negatives_scope.py) all consume THIS helper so the footprint
    cannot drift between them. ``config_overrides`` update Config fields
    (e.g. ``backbone_dtype='bfloat16'`` for the chip row,
    ``negatives_scope=...`` for the A/B).
    """
    from stego_tpu.config import Config
    from stego_tpu.models.vit import ViTConfig

    data_root = os.path.join(root, "data")
    write_synthetic_benchmark(data_root, n_train=n_train, n_val=n_val, res=64)
    vit_cfg = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=4,
                        img_size=64)
    fields = dict(
        output_root=os.path.join(root, "out"),
        pytorch_data_dir=data_root,
        dataset_name="directory", dir_dataset_name="synthbench",
        dir_dataset_n_classes=4, experiment_name="acc_tiny",
        model_type="vit_small", dino_patch_size=8,
        res=64, val_res=64, batch_size=8, val_batch_size=8,
        max_steps=40, val_freq=40, checkpoint_freq=40, num_neighbors=4,
        crop_type=None, loader_crop_type="center", backbone_dtype="float32",
        cache_dataset=True, seed=0,
    )
    fields.update(config_overrides)
    return Config(**fields), vit_cfg
