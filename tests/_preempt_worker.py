"""Subprocess worker for the preemption test: train on CPU until SIGTERM
(phase "start"), or resume from the preemption checkpoint (phase "resume")."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402


def build_data(root: str) -> None:
    import os

    rng = np.random.default_rng(0)
    for split, count in {"train": 16, "val": 8}.items():
        os.makedirs(f"{root}/synth/imgs/{split}", exist_ok=True)
        os.makedirs(f"{root}/synth/labels/{split}", exist_ok=True)
        for i in range(count):
            base = np.zeros((32, 32, 3), np.uint8)
            cls = i % 3
            base[:, :, cls] = 200
            base += rng.integers(0, 55, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(base).save(
                f"{root}/synth/imgs/{split}/{i:03d}.png")
            Image.fromarray(np.full((32, 32), cls, np.uint8)).save(
                f"{root}/synth/labels/{split}/{i:03d}.png")


def main():
    data_root, out_root, phase = sys.argv[1], sys.argv[2], sys.argv[3]

    from stego_tpu.config import Config
    from stego_tpu.models.vit import ViTConfig
    from stego_tpu.train.app import train
    from stego_tpu.train.knn_app import precompute_knns

    tiny = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                     img_size=16)
    cfg = Config(
        output_root=out_root, pytorch_data_dir=data_root,
        dataset_name="directory", dir_dataset_name="synth",
        dir_dataset_n_classes=3, res=16, val_res=16, dino_patch_size=4,
        dim=6, feature_samples=4, neg_samples=2, batch_size=8,
        val_batch_size=8, max_steps=10_000, val_freq=10_000,
        checkpoint_freq=10_000, scalar_log_freq=1, num_neighbors=4,
        backbone_dtype="float32", crop_type=None, loader_crop_type="center",
        model_type="vit_small",
    )
    if phase == "start":
        build_data(data_root)
        precompute_knns(cfg, dataset_names=["directory"], crop_types=[None],
                        vit_cfg=tiny, res=16, batch_size=8)
        train(cfg, vit_cfg=tiny)  # runs until SIGTERM
    else:
        from dataclasses import replace

        cfg = replace(cfg, resume=True, max_steps=int(sys.argv[4]),
                      val_freq=10_000, checkpoint_freq=10_000)
        train(cfg, vit_cfg=tiny)
    print("WORKER_DONE", flush=True)


if __name__ == "__main__":
    main()
