"""Demo inference on an unlabeled image folder.

Behavioral reference: src/demo_segmentation.py — flip-TTA code, linear +
cluster log-probs, per-image dense CRF, PNG label maps. CRF runs batched on
device here.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from stego_tpu.config import Config
from stego_tpu.data.datasets import UnlabeledImageFolder
from stego_tpu.data.loader import DataLoader, effective_threads
from stego_tpu.data.transforms import get_transform
from stego_tpu.eval.evaluate import load_model_for_eval, make_eval_step
from stego_tpu.models.vit import ViTConfig


def demo(cfg: Config, model_path: str, image_dir: str, result_dir: str,
         vit_cfg: Optional[ViTConfig] = None) -> int:
    """Returns the number of images processed."""
    seg, backbone, params = load_model_for_eval(model_path, vit_cfg=vit_cfg)
    os.makedirs(join(result_dir, "cluster"), exist_ok=True)
    os.makedirs(join(result_dir, "linear"), exist_ok=True)

    dataset = UnlabeledImageFolder(
        image_dir, get_transform(cfg.res, False, "center")
    )

    class _DictView:
        """Stream the folder through the prefetching DataLoader: each image
        decodes exactly once, decode overlaps device compute, and memory is
        bounded by prefetch x batch (the round-2 version pre-decoded the
        whole folder into RAM before the first device step)."""

        def __len__(self):
            return len(dataset)

        def __getitem__(self, i):
            img, name = dataset[i]
            return {"img": img, "name": name}

    loader = DataLoader(
        _DictView(),
        batch_size=min(cfg.batch_size * 2, max(1, len(dataset))),
        shuffle=False, drop_last=False,
        num_threads=effective_threads(cfg.num_workers),
    )
    eval_step = jax.jit(make_eval_step(seg, run_crf=cfg.run_crf))

    count = 0
    for batch in loader:
        img = jnp.asarray(batch["img"])
        dummy_label = jnp.zeros(img.shape[:3], jnp.int32)
        linear_preds, cluster_preds = eval_step(backbone, params, img,
                                                dummy_label)
        for j in range(len(batch["img"])):
            name = str(batch["name"][j])
            new_name = ".".join(name.split(".")[:-1]) + ".png"
            Image.fromarray(
                np.asarray(linear_preds[j]).astype(np.uint8)
            ).save(join(result_dir, "linear", new_name))
            Image.fromarray(
                np.asarray(cluster_preds[j]).astype(np.uint8)
            ).save(join(result_dir, "cluster", new_name))
            count += 1
    return count


def main(argv=None):
    from stego_tpu.config import prep_args

    overrides = prep_args(argv)
    base = overrides.pop("config", None)
    cfg = (Config.from_yaml(base, **overrides) if base
           else Config.from_dict(overrides, strict=True))
    if not cfg.model_path or not cfg.image_dir:
        raise SystemExit("pass model_path=... image_dir=...")
    result_dir = join("results", "predictions", cfg.experiment_name)
    n = demo(cfg, cfg.model_path, cfg.image_dir, result_dir)
    print(f"wrote {n} predictions to {result_dir}")


if __name__ == "__main__":
    main()
