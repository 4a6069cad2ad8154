"""A/B: negatives_scope=global vs local on the synthetic accuracy proxy.

VERDICT r4 asked whether shard-local negatives (the reference's per-process
DDP semantics, src/modules.py:291-295 under train_segmentation.py:476 — and
the mode that keeps the fused-sampling kernel live on meshes) cost accuracy
vs the single-process global derangements. This script trains the
tests/test_accuracy.py proxy twice on a 4-device CPU mesh (global batch 8 ->
2 images per shard, the TIGHTEST local-negative pool) and prints both metric
sets. Results are recorded in BASELINE.md.

Run: JAX_PLATFORMS=cpu python scripts/ab_negatives_scope.py
(tests/conftest-style 8-virtual-device CPU platform is self-configured)
"""

import json
import os
import sys
import tempfile

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stego_tpu.config import Config  # noqa: E402
from stego_tpu.data.synthetic import write_synthetic_benchmark  # noqa: E402
from stego_tpu.models.vit import ViTConfig  # noqa: E402
from stego_tpu.train.app import train  # noqa: E402
from stego_tpu.train.knn_app import precompute_knns  # noqa: E402

VIT = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=4, img_size=64)


def run(scope: str, root: str) -> dict:
    cfg = Config(
        output_root=os.path.join(root, f"out_{scope}"),
        pytorch_data_dir=os.path.join(root, "data"),
        dataset_name="directory", dir_dataset_name="synthbench",
        dir_dataset_n_classes=4, experiment_name=f"ab_{scope}",
        model_type="vit_small", dino_patch_size=8,
        res=64, val_res=64, batch_size=8, val_batch_size=8,
        max_steps=40, val_freq=40, checkpoint_freq=40, num_neighbors=4,
        crop_type=None, loader_crop_type="center", backbone_dtype="float32",
        cache_dataset=True, seed=0, num_devices=4,
        negatives_scope=scope,
    )
    return train(cfg, vit_cfg=VIT)


def main():
    root = tempfile.mkdtemp(prefix="ab_negscope_")
    write_synthetic_benchmark(os.path.join(root, "data"), n_train=32,
                              n_val=8, res=64)
    cfg0 = Config(pytorch_data_dir=os.path.join(root, "data"),
                  output_root=os.path.join(root, "knn"),
                  dataset_name="directory", dir_dataset_name="synthbench",
                  dir_dataset_n_classes=4, res=64, batch_size=8,
                  num_neighbors=4, crop_type=None,
                  loader_crop_type="center", backbone_dtype="float32",
                  cache_dataset=True, seed=0)
    precompute_knns(cfg0, dataset_names=["directory"], crop_types=[None],
                    vit_cfg=VIT, res=64, batch_size=8)
    # both runs share the SAME knn caches/data; copy into each output root
    results = {}
    for scope in ("global", "local"):
        # precompute_knns writes next to pytorch_data_dir; train reads from
        # the same place, so nothing to copy
        m = run(scope, root)
        results[scope] = {k: float(v) for k, v in m.items()
                          if k.startswith("test/")}
        print(scope, json.dumps(results[scope], indent=2))
    print(json.dumps({"ab_negatives_scope": results}))


if __name__ == "__main__":
    main()
