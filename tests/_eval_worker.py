"""Worker for the 2-process sharded-eval test (launched by test_multihost.py).

Runs jax.distributed across 2 CPU processes (1 device each) and calls the
REAL ``evaluate()`` entry: each process decodes its stripe of the val set,
the global batch is assembled over the 2-device mesh, and the confusion
matrices come back replicated (implicit psum). Process 0 writes the metrics
for comparison with a single-process run of the same checkpoint.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(pid: int, num_processes: int, port: int, data_root: str,
         ckpt_dir: str, out_path: str) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from stego_tpu.parallel.multihost import (
        is_primary,
        maybe_initialize_distributed,
    )

    assert maybe_initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes, process_id=pid,
    )
    assert jax.process_count() == num_processes

    from stego_tpu.config import Config
    from stego_tpu.eval.evaluate import evaluate
    from stego_tpu.models.vit import ViTConfig

    tiny_vit = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                         img_size=16)
    eval_cfg = Config(
        pytorch_data_dir=data_root, dataset_name="directory",
        dir_dataset_name="synth", dir_dataset_n_classes=3,
        res=16, batch_size=2, run_crf=False, crop_type=None,
        experiment_name="mh_eval",
    )
    metrics = evaluate(eval_cfg, ckpt_dir, vit_cfg=tiny_vit,
                       save_outputs=False)
    if is_primary():
        with open(out_path, "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
         sys.argv[5], sys.argv[6])
