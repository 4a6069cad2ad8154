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

from stego_tpu.data.synthetic import tiny_benchmark_setup  # noqa: E402
from stego_tpu.train.app import train  # noqa: E402
from stego_tpu.train.knn_app import precompute_knns  # noqa: E402


def main():
    root = tempfile.mkdtemp(prefix="ab_negscope_")
    # both runs share the SAME data + knn caches (precompute_knns writes
    # next to pytorch_data_dir, train reads from the same place); only the
    # output root and negatives_scope differ between the A and B arms
    results = {}
    for scope in ("global", "local"):
        cfg, vit = tiny_benchmark_setup(
            root, experiment_name=f"ab_{scope}",
            output_root=os.path.join(root, f"out_{scope}"),
            num_devices=4, negatives_scope=scope,
        )
        if scope == "global":
            precompute_knns(cfg, dataset_names=["directory"],
                            crop_types=[None], vit_cfg=vit, res=64,
                            batch_size=8)
        m = train(cfg, vit_cfg=vit)
        results[scope] = {k: float(v) for k, v in m.items()
                          if k.startswith("test/")}
        print(scope, json.dumps(results[scope], indent=2))
    print(json.dumps({"ab_negatives_scope": results}))


if __name__ == "__main__":
    main()
