"""Multi-host support: single-process degeneration + loader sharding."""

import os
import jax
import jax.numpy as jnp
import numpy as np

from stego_tpu.data.loader import DataLoader
from stego_tpu.parallel.mesh import batch_sharding, make_mesh
from stego_tpu.parallel.multihost import (
    global_batch,
    is_primary,
    maybe_initialize_distributed,
)


def test_single_process_passthrough():
    assert maybe_initialize_distributed() is False
    assert is_primary()


def test_global_batch_equals_sharded_device_put(cpu_devices):
    mesh = make_mesh()
    batch = {"img": np.random.default_rng(0).standard_normal(
        (8, 4, 4, 3)).astype(np.float32)}
    g = global_batch(mesh, batch)
    direct = jax.device_put(jnp.asarray(batch["img"]), batch_sharding(mesh))
    np.testing.assert_array_equal(np.asarray(g["img"]), np.asarray(direct))
    assert g["img"].sharding.is_equivalent_to(direct.sharding, 4)


def test_loader_sharding_partitions_globally():
    data = [{"x": np.full((2,), i)} for i in range(17)]
    shards = []
    for si in range(4):
        loader = DataLoader(data, batch_size=2, shuffle=True, seed=3,
                            num_shards=4, shard_index=si, prefetch=0)
        seen = []
        for b in loader:
            seen.extend(b["x"][:, 0].tolist())
        shards.append(seen)
        assert len(loader) == 2  # 17 -> 4 per shard -> 2 batches of 2
    flat = [v for s in shards for v in s]
    # disjoint across shards
    assert len(set(flat)) == len(flat)
    # equal lengths -> same number of steps on every host
    assert len({len(s) for s in shards}) == 1


def test_two_process_distributed_matches_single(tmp_path):
    """Launch 2 real jax.distributed CPU processes (1 device each) through
    maybe_initialize_distributed, run 2 sharded train steps + a val step, and
    assert the losses and psum'd confusion matrix equal the single-process
    run — the initialize branch of parallel/multihost.py exercised for real
    (round-1 gap: it was dead code in every test)."""
    import socket
    import subprocess
    import sys as _sys

    # free port for the coordinator
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    out = str(tmp_path / "mh.json")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [_sys.executable, worker, str(pid), "2", str(port), out],
        env=env, cwd=os.path.dirname(os.path.dirname(worker)),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    ) for pid in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    import json

    with open(out) as f:
        multi = json.load(f)

    # single-process reference with the identical construction
    from stego_tpu.config import Config
    from stego_tpu.models.vit import ViTConfig, init_vit_params
    from stego_tpu.parallel.mesh import make_mesh as _mm, \
        replicated_sharding as _rs
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
    mesh = _mm(2)
    backbone = jax.device_put(backbone, _rs(mesh))
    state = jax.device_put(state, _rs(mesh))
    key = jax.random.PRNGKey(2)
    batch = {
        "img": jax.random.normal(key, (b, 16, 16, 3)),
        "img_pos": jax.random.normal(jax.random.fold_in(key, 1),
                                     (b, 16, 16, 3)),
        "label": jax.random.randint(jax.random.fold_in(key, 2), (b, 16, 16),
                                    -1, 3),
        "label_pos": jax.random.randint(jax.random.fold_in(key, 3),
                                        (b, 16, 16), -1, 3),
    }
    batch = global_batch(mesh, {k: np.asarray(v) for k, v in batch.items()})
    step = jax.jit(make_train_step(seg))
    losses = []
    for i in range(2):
        state, metrics = step(backbone, state, batch, jax.random.PRNGKey(10 + i))
        losses.append(float(metrics["loss/total"]))
    val = jax.jit(make_val_step(seg))(
        backbone, state["params"], {k: batch[k] for k in ("img", "label")})
    conf = np.asarray(val["conf_cluster"])

    np.testing.assert_allclose(multi["losses"], losses, rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(multi["conf"]), conf)


def _make_eval_fixture(tmp_path):
    """Synthetic directory dataset + a 1-step orbax checkpoint for eval."""
    from PIL import Image

    from stego_tpu.config import Config
    from stego_tpu.models.vit import ViTConfig, init_vit_params
    from stego_tpu.train.checkpoint import CheckpointManager
    from stego_tpu.train.segmenter import UnsupervisedSegmenter

    rng = np.random.default_rng(0)
    root = tmp_path / "data"
    for split, count in {"train": 8, "val": 8}.items():
        (root / "synth" / "imgs" / split).mkdir(parents=True)
        (root / "synth" / "labels" / split).mkdir(parents=True)
        for i in range(count):
            base = np.zeros((16, 16, 3), np.uint8)
            base[:, :, i % 3] = 200
            base += rng.integers(0, 55, (16, 16, 3), dtype=np.uint8)
            Image.fromarray(base).save(
                root / "synth" / "imgs" / split / f"{i:03d}.png")
            Image.fromarray(np.full((16, 16), i % 3, np.uint8)).save(
                root / "synth" / "labels" / split / f"{i:03d}.png")

    tiny_vit = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                         img_size=16)
    cfg = Config(pytorch_data_dir=str(root), dataset_name="directory",
                 dir_dataset_name="synth", dir_dataset_n_classes=3,
                 res=16, val_res=16, dim=6, crop_type=None,
                 backbone_dtype="float32")
    seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg, vit_cfg=tiny_vit)
    ckpt_dir = str(tmp_path / "ckpt")
    mgr = CheckpointManager(ckpt_dir, cfg, save_top_k=1)
    mgr.save_backbone(init_vit_params(jax.random.PRNGKey(0), tiny_vit))
    mgr.save(1, jax.device_get(seg.init_state(jax.random.PRNGKey(1))),
             metrics={})
    mgr.close()
    return str(root), ckpt_dir, cfg, tiny_vit


def test_two_process_eval_matches_single(tmp_path):
    """Sharded eval (round-3 VERDICT item 6): 2 real jax.distributed
    processes run evaluate() — each decodes its stripe of the val set, conf
    matrices merge via the implicit psum — and the metrics must equal a
    single-process evaluate of the same checkpoint."""
    import socket
    import subprocess
    import sys as _sys

    data_root, ckpt_dir, cfg, tiny_vit = _make_eval_fixture(tmp_path)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "_eval_worker.py")
    out = str(tmp_path / "eval.json")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [_sys.executable, worker, str(pid), "2", str(port), data_root,
         ckpt_dir, out],
        env=env, cwd=os.path.dirname(os.path.dirname(worker)),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    ) for pid in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    import json

    from stego_tpu.eval.evaluate import evaluate

    with open(out) as f:
        multi = json.load(f)

    eval_cfg = cfg.replace(batch_size=2, run_crf=False,
                           experiment_name="mh_eval")
    single = evaluate(eval_cfg, ckpt_dir, vit_cfg=tiny_vit,
                      save_outputs=False)
    assert set(multi) == set(single)
    for k in single:
        np.testing.assert_allclose(multi[k], float(single[k]), atol=1e-4,
                                   err_msg=k)


def test_two_process_cached_sharded_matches_single(tmp_path):
    """Round-3 VERDICT item 6: `feat_cache_sharded`, `steps_per_dispatch>1`
    (K=2 multi-step window), and checkpoint-resume all under REAL
    jax.distributed (2 CPU processes, 1 device each). The worker runs
    2 single cached steps -> symmetric orbax checkpoint -> one K=2 window ->
    restore -> replay; the losses must match a single-process run of the
    identical protocol, and the resumed window must reproduce the original
    chain exactly."""
    import socket
    import subprocess
    import sys as _sys

    from tests import _cached_worker as cw

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "_cached_worker.py")
    out = str(tmp_path / "cached.json")
    ckpt_dir = str(tmp_path / "mp_ckpt")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [_sys.executable, worker, str(pid), "2", str(port), ckpt_dir, out],
        env=env, cwd=os.path.dirname(os.path.dirname(worker)),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    ) for pid in range(2)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    import json

    with open(out) as f:
        multi = json.load(f)

    # single-process reference: the identical protocol on a 2-device mesh
    from stego_tpu.models.vit import init_vit_params
    from stego_tpu.train.segmenter import UnsupervisedSegmenter

    cfg = cw.make_cfg()
    mesh = make_mesh(2)
    seg = UnsupervisedSegmenter(n_classes=3, cfg=cfg,
                                vit_cfg=cw.make_vit_cfg(), mesh=mesh)
    backbone_host = jax.device_get(
        init_vit_params(jax.random.PRNGKey(0), cw.make_vit_cfg()))
    state_host = jax.device_get(seg.init_state(jax.random.PRNGKey(1)))
    feats, labels, inds, ind_pos = cw.host_inputs(seg, backbone_host)
    losses, resumed, digest, rdigest = cw.run_protocol(
        mesh, seg, backbone_host, state_host, feats, labels, inds, ind_pos,
        str(tmp_path / "sp_ckpt"), cfg, lambda name: None)

    np.testing.assert_allclose(multi["losses"], losses, rtol=2e-5, atol=1e-6)
    # exact resume: the restored window reproduces the original chain
    np.testing.assert_allclose(multi["resumed"], multi["losses"][2:4],
                               rtol=0, atol=0)
    np.testing.assert_allclose(resumed, losses[2:4], rtol=0, atol=0)
    assert multi["rdigest"] == multi["digest"]
    np.testing.assert_allclose(multi["digest"], digest, rtol=2e-5)
