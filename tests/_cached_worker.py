"""Worker for the 2-process cached-mode multihost tests (launched by
test_multihost.py, underscore-prefixed so pytest doesn't collect it).

Covers the round-3 VERDICT item: `feat_cache_sharded`, `steps_per_dispatch>1`
(make_cached_multi_step), and checkpoint-resume under real jax.distributed.
The construction helpers are shared with the single-process reference run in
test_multihost.py::test_two_process_cached_sharded_matches_single.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ITEMS = 12
RES = 16
B = 8
K = 2  # steps per dispatch in the multi-step window


def make_cfg():
    from stego_tpu.config import Config

    return Config(
        dataset_name="directory", dir_dataset_name="mh_cached", res=RES,
        dim=6, feature_samples=4, neg_samples=2, batch_size=B,
        backbone_dtype="float32", crop_type=None, num_neighbors=3,
        cache_backbone_feats=True, feat_cache_sharded=True,
        steps_per_dispatch=K,
    )


def make_vit_cfg():
    from stego_tpu.models.vit import ViTConfig

    return ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                     img_size=16)


def host_inputs(seg, backbone):
    """Everything computed identically on every process, host-side."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(N_ITEMS, RES, RES, 3)).astype(np.float32)
    labels = rng.integers(-1, 3, size=(N_ITEMS, RES, RES)).astype(np.int16)
    feats = np.asarray(seg.net.backbone_features(backbone, jnp.asarray(imgs)))
    # fixed index schedule for 4 steps (2 single + one K=2 window)
    inds = np.array([
        [3, 0, 7, 5, 11, 2, 9, 4],
        [2, 5, 1, 9, 0, 4, 8, 6],
        [6, 1, 10, 0, 5, 7, 2, 11],
        [4, 9, 3, 8, 1, 0, 6, 2],
    ], np.int32)
    ind_pos = np.array([
        [1, 6, 2, 8, 0, 10, 3, 7],
        [0, 3, 11, 2, 7, 5, 1, 10],
        [9, 4, 0, 6, 2, 1, 8, 5],
        [7, 2, 5, 1, 10, 3, 0, 9],
    ], np.int32)
    return feats, labels, inds, ind_pos


def place(full, sharding):
    """Global array from the full host value via shard-index callback —
    works identically single- and multi-process."""
    import jax
    import jax.numpy as jnp

    full = jnp.asarray(full)
    return jax.make_array_from_callback(full.shape, sharding,
                                        lambda idx: full[idx])


def run_protocol(mesh, seg, backbone_host, state_host, feats, labels, inds,
                 ind_pos, ckpt_dir, cfg, barrier):
    """2 single cached steps -> checkpoint -> K=2 multi window -> restore ->
    replay the window. Returns (losses[4], resumed[2], digest, rdigest)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stego_tpu.parallel.mesh import (
        batch_sharding,
        replicated_sharding,
        stacked_batch_sharding,
    )
    from stego_tpu.train.checkpoint import CheckpointManager
    from stego_tpu.train.segmenter import (
        make_cached_multi_step,
        make_cached_train_step,
    )

    bs, rs, ss = (batch_sharding(mesh), replicated_sharding(mesh),
                  stacked_batch_sharding(mesh))
    backbone = jax.tree.map(lambda a: place(a, rs), backbone_host)
    state = jax.tree.map(lambda a: place(a, rs), state_host)
    cache = {"feats": place(feats, bs), "label": place(labels, bs)}

    step_fn = jax.jit(make_cached_train_step(seg, with_hist=False))
    multi_fn = jax.jit(make_cached_multi_step(seg, K))
    key = jax.random.PRNGKey(5)

    losses = []
    for i in range(2):
        batch = {"ind": place(inds[i], bs), "ind_pos": place(ind_pos[i], bs)}
        state, metrics = step_fn(cache, state, batch,
                                 jax.random.fold_in(key, i))
        losses.append(float(metrics["loss/total"]))

    # checkpoint after step 2 (state is replicated -> device_get is global).
    # EVERY process participates (orbax multihost barriers — train/app.py);
    # only process 0 writes files.
    host_state = jax.device_get(state)
    mgr = CheckpointManager(ckpt_dir, cfg, save_top_k=1)
    mgr.save(2, host_state, metrics={"test/cluster/mIoU": 1.0})
    mgr.close()
    barrier("cached_ckpt_saved")

    window = {"ind": place(inds[2:4], ss), "ind_pos": place(ind_pos[2:4], ss)}
    state, m = multi_fn(cache, state, window, key, 2)
    losses.extend(np.asarray(m["loss/total"]).tolist())
    digest = float(jnp.sum(state["params"]["head"]["cluster1"]["kernel"]))

    # resume: every process restores (shared FS semantics), replays the
    # same window — must reproduce the original chain exactly
    rmgr = CheckpointManager(ckpt_dir, cfg, save_top_k=1)
    rstep, rstate_host = rmgr.restore(template=host_state)
    rmgr.close()
    assert rstep == 2, rstep
    rstate = jax.tree.map(lambda a: place(a, rs), rstate_host)
    rstate, rm = multi_fn(cache, rstate, window, key, 2)
    resumed = np.asarray(rm["loss/total"]).tolist()
    rdigest = float(jnp.sum(rstate["params"]["head"]["cluster1"]["kernel"]))
    return losses, resumed, digest, rdigest


def main(pid: int, num_processes: int, port: int, ckpt_dir: str,
         out_path: str) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.experimental import multihost_utils

    from stego_tpu.models.vit import init_vit_params
    from stego_tpu.parallel.mesh import make_mesh
    from stego_tpu.parallel.multihost import (
        is_primary,
        maybe_initialize_distributed,
    )
    from stego_tpu.train.segmenter import UnsupervisedSegmenter

    assert maybe_initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes, process_id=pid,
    )
    assert jax.device_count() == num_processes

    cfg = make_cfg()
    mesh = make_mesh()
    seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg,
                                vit_cfg=make_vit_cfg(), mesh=mesh)
    backbone_host = jax.device_get(init_vit_params(jax.random.PRNGKey(0),
                                                   make_vit_cfg()))
    state_host = jax.device_get(seg.init_state(jax.random.PRNGKey(1)))
    feats, labels, inds, ind_pos = host_inputs(seg, backbone_host)

    losses, resumed, digest, rdigest = run_protocol(
        mesh, seg, backbone_host, state_host, feats, labels, inds, ind_pos,
        ckpt_dir, cfg, multihost_utils.sync_global_devices)

    if is_primary():
        with open(out_path, "w") as f:
            json.dump({"losses": losses, "resumed": resumed,
                       "digest": digest, "rdigest": rdigest}, f)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
         sys.argv[5])
