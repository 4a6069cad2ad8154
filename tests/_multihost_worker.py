"""Worker for the 2-process multihost smoke test (launched by
test_multihost.py, underscore-prefixed so pytest doesn't collect it).

Runs jax.distributed across 2 CPU processes (1 device each), builds the tiny
training setup of __graft_entry__.dryrun_multichip, executes 2 sharded train
steps + a val step, and (process 0) writes the losses and the psum'd cluster
confusion matrix to a JSON file for comparison with the single-process run.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(pid: int, num_processes: int, port: int, out_path: str) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from stego_tpu.parallel.multihost import (
        global_batch,
        is_primary,
        maybe_initialize_distributed,
    )

    assert maybe_initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes, process_id=pid,
    )
    assert jax.process_count() == num_processes
    assert jax.device_count() == num_processes

    import jax.numpy as jnp
    import numpy as np

    from stego_tpu.config import Config
    from stego_tpu.models.vit import ViTConfig, init_vit_params
    from stego_tpu.parallel.mesh import make_mesh, replicated_sharding
    from stego_tpu.train.segmenter import (
        UnsupervisedSegmenter,
        make_train_step,
        make_val_step,
    )

    tiny_vit = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                         img_size=16)
    b = 4
    cfg = Config(dataset_name="directory", dir_dataset_name="mh",
                 dir_dataset_n_classes=3, res=16, dim=6, feature_samples=3,
                 neg_samples=2, crop_type=None, backbone_dtype="float32",
                 batch_size=b)
    seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg, vit_cfg=tiny_vit)

    backbone = init_vit_params(jax.random.PRNGKey(0), tiny_vit)
    state = seg.init_state(jax.random.PRNGKey(1))
    mesh = make_mesh()
    rs = replicated_sharding(mesh)
    backbone = jax.device_put(backbone, rs)
    state = jax.device_put(state, rs)

    key = jax.random.PRNGKey(2)
    full = {
        "img": np.asarray(jax.random.normal(key, (b, 16, 16, 3))),
        "img_pos": np.asarray(
            jax.random.normal(jax.random.fold_in(key, 1), (b, 16, 16, 3))),
        "label": np.asarray(jax.random.randint(
            jax.random.fold_in(key, 2), (b, 16, 16), -1, 3)),
        "label_pos": np.asarray(jax.random.randint(
            jax.random.fold_in(key, 3), (b, 16, 16), -1, 3)),
    }
    half = b // num_processes
    local = {k: v[pid * half:(pid + 1) * half] for k, v in full.items()}
    batch = global_batch(mesh, local)

    train_step = jax.jit(make_train_step(seg))
    losses = []
    for i in range(2):
        state, metrics = train_step(backbone, state, batch,
                                    jax.random.PRNGKey(10 + i))
        losses.append(float(metrics["loss/total"]))

    val_step = jax.jit(make_val_step(seg))
    val = val_step(backbone, state["params"],
                   {k: batch[k] for k in ("img", "label")})
    conf = np.asarray(jax.device_get(val["conf_cluster"]))

    if is_primary():
        with open(out_path, "w") as f:
            json.dump({"losses": losses, "conf": conf.tolist()}, f)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
