"""Training application: the ``train_segmentation`` entry point.

Behavioral reference: the Hydra main + Lightning Trainer wiring in
src/train_segmentation.py:386-497, collapsed into one explicit loop:
step-based training with periodic sharded validation (Hungarian metrics on
host), top-k checkpointing by cluster mIoU, and JSONL/TB scalar logging.
"""

from __future__ import annotations

import os
import time
from os.path import join
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stego_tpu.config import Config
from stego_tpu.data.contrastive import ContrastiveSegDataset
from stego_tpu.data.loader import (DataLoader, effective_threads,
                                   infinite_batches)
from stego_tpu.data.transforms import get_transform
from stego_tpu.models.vit import ViTConfig, init_vit_params
from stego_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from stego_tpu.train.checkpoint import CheckpointManager
from stego_tpu.train.segmenter import (
    UnsupervisedSegmenter,
    make_train_step,
    make_val_step,
)
from stego_tpu.utils.logging import MetricLogger
from stego_tpu.utils.metrics import UnsupervisedMetrics

TRAIN_BATCH_KEYS = ("img", "label", "img_pos", "label_pos", "mask", "mask_pos",
                    "img_aug", "coord_aug", "ind", "ind_pos")

# row i of a device-resident (n_steps, B, ...) schedule, sliced ON DEVICE
# (traced index: one compile serves every row)
_sched_row = jax.jit(
    lambda a, i: jax.lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False))


def get_class_labels(dataset_name: str):
    """Human-readable class names (reference train_segmentation.py:20-50)."""
    if dataset_name.startswith("cityscapes"):
        return [
            "road", "sidewalk", "parking", "rail track", "building", "wall",
            "fence", "guard rail", "bridge", "tunnel", "pole", "polegroup",
            "traffic light", "traffic sign", "vegetation", "terrain", "sky",
            "person", "rider", "car", "truck", "bus", "caravan", "trailer",
            "train", "motorcycle", "bicycle",
        ]
    if dataset_name == "cocostuff27":
        return [
            "electronic", "appliance", "food", "furniture", "indoor",
            "kitchen", "accessory", "animal", "outdoor", "person", "sports",
            "vehicle", "ceiling", "floor", "food", "furniture", "rawmaterial",
            "textile", "wall", "window", "building", "ground", "plant", "sky",
            "solid", "structural", "water",
        ]
    # (the reference also lists VOC classes, train_segmentation.py:36-43, but
    # neither codebase can construct a voc dataset — vestige not carried over)
    if dataset_name == "potsdam":
        return ["roads and cars", "buildings and clutter",
                "trees and vegetation"]
    raise ValueError(f"Unknown Dataset {dataset_name}")


def build_backbone(cfg: Config, vit_cfg: ViTConfig, key: jax.Array,
                   cast: bool = True):
    """Backbone weights from disk when provided; random init otherwise
    (offline environments). Reference downloads from URL tables
    (modules.py:35-62, utils.py:69-125). bf16 trunks get their block matmul
    weights CAST ONCE to bf16 storage (bitwise-identical compute; skips
    ~500 MB/step of f32->bf16 weight conversion on ViT-B — round-5 profile,
    models/vit.py:cast_params_for_compute). ``cast=False`` returns the
    full-precision tree — the train app saves THAT to the checkpoint so the
    artifact keeps the source weights' precision (a bf16-truncated save
    would silently degrade any later f32-parity use of the checkpoint)."""
    from stego_tpu.models.vit import cast_params_for_compute

    def _cast(p):
        if cast and cfg.backbone_dtype == "bfloat16":
            return cast_params_for_compute(p, jnp.bfloat16)
        return p

    if cfg.arch == "feature-pyramid":
        from stego_tpu.models.resnet import (
            init_resnet50_params,
            load_resnet_backbone,
        )

        if cfg.pretrained_weights:
            return jax.tree.map(
                jnp.asarray,
                load_resnet_backbone(cfg.model_type, cfg.pretrained_weights),
            )
        print("WARNING: no pretrained_weights — random ResNet-50 backbone.")
        return init_resnet50_params(key)
    if cfg.pretrained_weights:
        from stego_tpu.models.convert import load_dino_backbone

        params, _ = load_dino_backbone(
            cfg.pretrained_weights, cfg.model_type, cfg.dino_patch_size,
            in_chans=4 if cfg.potsdam_ir else 3,
        )
        return _cast(jax.tree.map(jnp.asarray, params))
    print(
        "WARNING: no pretrained_weights given — using a randomly initialized "
        "backbone (reference behavior is to download DINO weights; provide "
        "pretrained_weights=<path to .pth> for parity)."
    )
    return _cast(init_vit_params(key, vit_cfg))


def make_datasets(cfg: Config):
    # host-side augmentation only when the device path is disabled
    # (device_augs=true computes img_aug/coord_aug inside the jitted step)
    need_aug = cfg.aug_alignment_weight > 0 and not cfg.device_augs
    train_dataset = ContrastiveSegDataset(
        pytorch_data_dir=cfg.pytorch_data_dir,
        dataset_name=cfg.dataset_name,
        crop_type=cfg.crop_type,
        image_set="train",
        transform=get_transform(cfg.res, False, cfg.loader_crop_type,
                                fast_decode=cfg.fast_decode),
        target_transform=get_transform(cfg.res, True, cfg.loader_crop_type),
        cfg=cfg,
        aug_geometric=need_aug,
        aug_photometric=need_aug,
        num_neighbors=cfg.num_neighbors,
        mask=True,
        pos_images=cfg.correspondence_weight > 0,
        pos_labels=cfg.correspondence_weight > 0,
        seed=cfg.seed,
    )
    if cfg.cache_dataset or cfg.cache_dataset_dir:
        if cfg.loader_crop_type == "random":
            raise ValueError("cache_dataset requires a deterministic "
                             "loader_crop_type (not 'random')")
    def _wrap_cached(inner, image_set, res, crop_type, loader_crop):
        """Apply the configured decode caches (one shared naming/signature
        scheme for both splits)."""
        if cfg.cache_dataset_dir:
            from stego_tpu.data.loader import DiskCachedDataset

            nice = cfg.dir_dataset_name if cfg.dataset_name == "directory" \
                else cfg.dataset_name
            inner = DiskCachedDataset(
                inner,
                join(cfg.cache_dataset_dir,
                     f"{nice}_{image_set}_{crop_type}_{res}"),
                signature={"res": res, "crop_type": str(crop_type),
                           "image_set": image_set,
                           "loader_crop": str(loader_crop),
                           "potsdam_ir": cfg.potsdam_ir},
            )
        if cfg.cache_dataset:
            from stego_tpu.data.loader import CachedDataset

            inner = CachedDataset(inner)
        return inner

    train_dataset.dataset = _wrap_cached(
        train_dataset.dataset, "train", cfg.res, cfg.crop_type,
        cfg.loader_crop_type)
    val_loader_crop = "center"
    val_dataset = ContrastiveSegDataset(
        pytorch_data_dir=cfg.pytorch_data_dir,
        dataset_name=cfg.dataset_name,
        crop_type=None,
        image_set="val",
        transform=get_transform(cfg.val_res, False, val_loader_crop),
        target_transform=get_transform(cfg.val_res, True, val_loader_crop),
        mask=True,
        cfg=cfg,
        seed=cfg.seed,
    )
    # validation re-runs every val_freq steps — cache its decode too (the
    # 1-core host decodes ~46 imgs/s; a large val set would dominate the
    # validation epoch otherwise)
    val_dataset.dataset = _wrap_cached(
        val_dataset.dataset, "val", cfg.val_res, None, val_loader_crop)
    return train_dataset, val_dataset


def _device_batch(batch: Dict[str, Any], sharding) -> Dict[str, jnp.ndarray]:
    from stego_tpu.data.loader import compact_batch

    compact = compact_batch(
        {k: batch[k] for k in TRAIN_BATCH_KEYS if k in batch})
    return {k: jax.device_put(jnp.asarray(v), sharding)
            for k, v in compact.items()}


def _pad_batch(batch: Dict[str, Any], size: int) -> Dict[str, Any]:
    """Pad a short final batch to ``size`` with ignore-labeled copies
    (ignore-INDEXED in cached-validation index batches)."""
    n = len(next(iter(batch.values())))
    if n == size:
        return batch
    pad = size - n
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        reps = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
        if k.startswith("label") or k == "ind":
            reps[n:] = -1  # padded pixels/indices are ignored downstream
        out[k] = reps
    return out


def run_validation(seg, val_step, backbone, params, val_loader, mesh,
                   batch_size: int, figure_prefix: Optional[str] = None,
                   val_cache=None, val_base=None,
                   val_epoch=None) -> Dict[str, float]:
    """Sharded validation epoch: device-side confusion matrices, host-side
    Hungarian (reference validation_step/epoch_end,
    train_segmentation.py:254-283). When ``figure_prefix`` is given, also
    renders the per-validation figures the reference logs to TB: the
    image/label/linear/cluster prediction panel (train_segmentation.py:290-302),
    the Hungarian-matched cluster confusion-matrix heatmap (:304-330), and the
    label/cluster frequency bar charts (:332-359), as
    ``{prefix}panel.png`` / ``{prefix}confusion.png`` / ``{prefix}freqs.png``."""
    bs = batch_sharding(mesh)
    linear_metrics = UnsupervisedMetrics("test/linear/", seg.n_classes, 0, False)
    cluster_metrics = UnsupervisedMetrics(
        "test/cluster/", seg.n_classes, seg.cfg.extra_clusters, True
    )
    from stego_tpu.parallel.multihost import global_batch as _global_batch

    pc = jax.process_count()
    panel = None
    if val_epoch is not None and val_cache is not None and pc == 1:
        # whole cached epoch in ONE dispatch (scan over stacked index
        # batches; only two confusion matrices leave the device). The panel
        # figure needs per-pixel preds of a handful of images — one extra
        # single-batch dispatch when figures are requested.
        from stego_tpu.parallel.mesh import stacked_batch_sharding

        batches = [_pad_batch(b, batch_size) for b in val_loader]
        inds = np.stack([np.asarray(b["ind"]).astype(np.int32)
                         for b in batches])
        dev = jax.device_put(jnp.asarray(inds), stacked_batch_sharding(mesh))
        out = val_epoch(val_cache, params, dev)
        linear_metrics.merge_stats(np.asarray(out["conf_linear"]))
        cluster_metrics.merge_stats(np.asarray(out["conf_cluster"]))
        if figure_prefix is not None and batches:
            first = {"ind": jax.device_put(jnp.asarray(inds[0]), bs)}
            out1 = val_step(val_cache, params, first)
            idxs = [int(i) for i in inds[0][:seg.cfg.n_images] if int(i) >= 0]
            items = [val_base[i] for i in idxs]
            n = len(idxs)
            panel = {
                "img": np.stack([it[0] for it in items]),
                "label": np.stack([it[1] for it in items]),
                "linear": np.asarray(out1["linear_preds"][:n]),
                "cluster": np.asarray(out1["cluster_preds"][:n]),
            }
        val_iter = []
    else:
        val_iter = val_loader
    conf_sums = None  # device-resident epoch accumulators: fetch ONCE per
    # epoch instead of one ~30 ms round trip per batch (CLAUDE.md)
    for batch in val_iter:
        batch = _pad_batch(batch, batch_size)
        from stego_tpu.data.loader import compact_batch

        if val_cache is not None:
            # cached validation (cache_backbone_feats): index-only batches
            # against the val_res feature cache — no decode, no backbone
            host = {"ind": np.asarray(batch["ind"]).astype(np.int32)}
            if pc > 1:
                dev = _global_batch(mesh, host)
            else:
                dev = {k: jax.device_put(jnp.asarray(v), bs)
                       for k, v in host.items()}
            out = val_step(val_cache, params, dev)
        else:
            host = compact_batch({"img": np.asarray(batch["img"]),
                                  "label": np.asarray(batch["label"])})
            if pc > 1:
                dev = _global_batch(mesh, host)
            else:
                dev = {k: jax.device_put(jnp.asarray(v), bs)
                       for k, v in host.items()}
            out = val_step(backbone, params, dev)
        conf_sums = ((out["conf_linear"], out["conf_cluster"])
                     if conf_sums is None
                     else (conf_sums[0] + out["conf_linear"],
                           conf_sums[1] + out["conf_cluster"]))
        if panel is None and figure_prefix is not None:
            if val_cache is not None:
                # decode just the panel images from the base val dataset
                idxs = [int(i) for i in np.asarray(batch["ind"])
                        [:seg.cfg.n_images] if int(i) >= 0]
                items = [val_base[i] for i in idxs]
                imgs = np.stack([it[0] for it in items])
                labels = np.stack([it[1] for it in items])
                n = len(idxs)
            else:
                n = min(seg.cfg.n_images, len(host["img"]))
                imgs, labels = host["img"][:n], host["label"][:n]
            panel = {
                "img": imgs, "label": labels,
                "linear": np.asarray(out["linear_preds"][:n]),
                "cluster": np.asarray(out["cluster_preds"][:n]),
            }
    if conf_sums is not None:
        linear_metrics.merge_stats(np.asarray(conf_sums[0]))
        cluster_metrics.merge_stats(np.asarray(conf_sums[1]))
    metrics = {**linear_metrics.compute(), **cluster_metrics.compute()}
    if panel is not None:
        from stego_tpu.data.colormaps import colormap_for_dataset
        from stego_tpu.utils.viz import (
            save_comparison_grid,
            save_confusion_matrix,
            save_frequency_bars,
        )

        cmap = colormap_for_dataset(seg.cfg.dataset_name)
        mapped = cluster_metrics.map_clusters(panel["cluster"])
        save_comparison_grid(
            figure_prefix + "panel.png",
            {"Image": panel["img"], "Label": panel["label"],
             "Linear Probe": panel["linear"],
             "Cluster Probe": np.asarray(mapped)},
            cmap,
        )
        try:
            names = get_class_labels(seg.cfg.dataset_name)[:seg.n_classes]
        except ValueError:
            names = [f"class {i}" for i in range(seg.n_classes)]
        if seg.cfg.extra_clusters:
            names = names + ["Extra"]
        save_confusion_matrix(figure_prefix + "confusion.png",
                              cluster_metrics.histogram, names)
        save_frequency_bars(figure_prefix + "freqs.png",
                            cluster_metrics.histogram, names, cmap)
    return metrics


def train(cfg: Config, vit_cfg: Optional[ViTConfig] = None,
          train_dataset=None, val_dataset=None) -> Dict[str, float]:
    """Run training to cfg.max_steps; returns the final validation metrics.

    ``vit_cfg``/datasets are injectable for tests; production callers pass
    only ``cfg``.
    """
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from stego_tpu.parallel.multihost import (
        global_batch,
        is_primary,
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()
    pc = jax.process_count()
    primary = is_primary()

    log_dir = join(cfg.output_root, "logs",
                   f"{cfg.dataset_name}_{cfg.experiment_name}")
    ckpt_dir = join(cfg.output_root, "checkpoints",
                    f"{cfg.dataset_name}_{cfg.experiment_name}")
    from stego_tpu.utils.logging import AsyncMetricWriter, NullLogger

    # async writer: the loop hands DEVICE scalars to a worker thread — a
    # synchronous float() every scalar_log_freq steps costs a full
    # device->host round trip (~30 ms on tunneled hosts, CLAUDE.md)
    logger = (AsyncMetricWriter(MetricLogger(log_dir)) if primary
              else NullLogger())

    if train_dataset is None or val_dataset is None:
        train_dataset, val_dataset = make_datasets(cfg)

    n_classes = train_dataset.n_classes
    mesh = make_mesh(cfg.num_devices)
    # Pallas kernels run per batch shard on >1-device meshes (shard_map);
    # nothing is disabled — the fast path survives multi-chip.
    seg = UnsupervisedSegmenter(n_classes, cfg, vit_cfg=vit_cfg, mesh=mesh)

    key = jax.random.PRNGKey(cfg.seed)
    k_backbone, k_state, k_steps = jax.random.split(key, 3)
    # full-precision tree kept for the checkpoint artifact; the compute copy
    # gets bf16 storage below (bitwise-identical compute — models/vit.py)
    backbone_store = build_backbone(cfg, seg.vit_cfg, k_backbone, cast=False)
    if cfg.backbone_dtype == "bfloat16":
        from stego_tpu.models.vit import cast_params_for_compute

        backbone = cast_params_for_compute(backbone_store, jnp.bfloat16)
    else:
        backbone = backbone_store
    state = seg.init_state(k_state)

    bs, rs = batch_sharding(mesh), replicated_sharding(mesh)
    backbone = jax.device_put(backbone, rs)
    state = jax.device_put(state, rs)

    # Frozen-backbone feature cache: one backbone pass now, index-only
    # batches afterwards (train/feat_cache.py — beyond-reference; the
    # reference recomputes identical DINO features every epoch).
    feat_cache = val_cache = None
    if cfg.cache_backbone_feats:
        from stego_tpu.train.feat_cache import build_feat_cache

        t_fc = time.time()
        feat_cache = build_feat_cache(seg, backbone, train_dataset, cfg, mesh)
        # val epochs re-run the frozen backbone over the SAME deterministic
        # split every val_freq steps — cache those features too (no masks;
        # built at val_res)
        val_cache = build_feat_cache(seg, backbone, val_dataset, cfg, mesh,
                                     res=cfg.val_res, with_mask=False)
        fc_gb = sum(a.nbytes for c in (feat_cache, val_cache)
                    for a in c.values()) / 2**30
        print(f"feature cache: {len(train_dataset)} train + "
              f"{len(val_dataset)} val items, {fc_gb:.2f} GiB in HBM, "
              f"built in {time.time() - t_fc:.1f}s")

    def _jit_step(with_hist: bool):
        if feat_cache is not None:
            from stego_tpu.train.segmenter import make_cached_train_step

            raw_step = make_cached_train_step(seg, with_hist=with_hist)
        else:
            raw_step = make_train_step(seg, with_hist=with_hist)
        if cfg.checkify:
            # sanitizer mode (SURVEY.md §5): float checks on every op; errors
            # surface with source locations instead of silent NaN propagation
            from jax.experimental import checkify as _checkify

            checked = _checkify.checkify(raw_step,
                                         errors=_checkify.float_checks)

            def stepped(backbone, state, batch, key):
                err, out = checked(backbone, state, batch, key)
                _checkify.check_error(err)
                return out

            return jax.jit(stepped)
        return jax.jit(raw_step, donate_argnums=(1,))

    # two step variants: the hot one carries zero histogram work; the hist
    # one (compiled lazily on its first hist_freq step) additionally bins the
    # cd tensors on device. Measured on v5e: see CLAUDE.md perf notes.
    train_step = _jit_step(False)
    train_step_hist = _jit_step(True) if cfg.hist_freq else train_step
    # cached mode: K steps per dispatch (lax.scan over stacked index batches)
    # amortizes per-dispatch latency — semantics/keys/logs identical to K
    # single steps (segmenter.make_cached_multi_step)
    multi_step = None
    k_multi = cfg.steps_per_dispatch
    if feat_cache is not None and k_multi > 1 and not cfg.checkify:
        from stego_tpu.train.segmenter import make_cached_multi_step

        multi_step = jax.jit(make_cached_multi_step(seg, k_multi),
                             donate_argnums=(1,))
    val_epoch = None
    if val_cache is not None:
        from stego_tpu.train.segmenter import (
            make_cached_val_epoch,
            make_cached_val_step,
        )

        val_step = jax.jit(make_cached_val_step(seg))
        val_epoch = jax.jit(make_cached_val_epoch(seg))
    else:
        val_step = jax.jit(make_val_step(seg))

    # per-host loaders: each process decodes its stripe of the global batch
    val_bs = cfg.val_batch_size or cfg.batch_size
    if cfg.batch_size % pc or val_bs % pc:
        raise ValueError(f"batch sizes must divide process_count={pc}")
    d = mesh.devices.size
    if cfg.batch_size % d or val_bs % d:
        raise ValueError(
            f"batch sizes ({cfg.batch_size}, val {val_bs}) must be divisible "
            f"by the mesh size {d} (Pallas kernels shard the batch evenly)")
    pi = jax.process_index()
    if feat_cache is not None:
        from stego_tpu.train.feat_cache import FeatCacheSampler

        train_items = FeatCacheSampler(train_dataset)
        val_items = FeatCacheSampler(val_dataset)  # index-only (no pos)
    else:
        train_items = train_dataset
        val_items = val_dataset
    nthreads = effective_threads(cfg.num_workers)
    train_loader = DataLoader(train_items, cfg.batch_size // pc,
                              shuffle=True, seed=cfg.seed,
                              num_shards=pc, shard_index=pi,
                              num_threads=nthreads)
    val_loader = DataLoader(val_items, val_bs // pc, shuffle=False,
                            drop_last=False, num_shards=pc, shard_index=pi,
                            num_threads=nthreads)

    # EVERY process creates the manager and calls save/restore/close: orbax
    # coordinates multihost checkpoints with internal barriers + process
    # allgathers that all jax processes must enter — a primary-only manager
    # deadlocks (measured in a 2-process probe: sync_global_devices name
    # mismatch, then Gloo DEADLINE_EXCEEDED). With host (device_get) pytrees
    # only process 0 actually writes files.
    mgr = CheckpointManager(ckpt_dir, cfg, save_top_k=cfg.save_top_k)

    start_step = 0
    if cfg.resume:
        # every process restores (checkpoints live on a shared FS on pods);
        # PRNG folding is keyed by the absolute step index, so the resumed
        # run continues the exact key sequence, and the loader fast-forwards
        # to the exact mid-epoch position (one batch is consumed per step, so
        # the stream cursor IS the step count — no loader state in the
        # checkpoint needed). Exceeds Lightning-restart semantics, which
        # replays the epoch from its start.
        try:
            start_step, restored = mgr.restore(
                template=jax.device_get(state))
            state = jax.device_put(restored, rs)
            train_loader.fast_forward(start_step)
            print(f"resumed from checkpoint step {start_step}")
        except FileNotFoundError:
            print(f"resume=true but no checkpoints in {ckpt_dir}; "
                  "starting fresh")
    # save the FULL-PRECISION tree: the checkpoint must keep the source
    # weights' precision even when the compute copy stores bf16
    mgr.save_backbone(backbone_store)
    # that save was the store's only job — drop it so a bf16 run doesn't
    # hold both precision copies in HBM for the rest of training (~344 MB
    # of dead f32 weights on ViT-B; `backbone` is the compute tree)
    del backbone_store

    # only ship what the step consumes — the host->device link is the
    # bottleneck on tunneled setups (masks only matter under use_salience,
    # aug tensors only under aug_alignment)
    if feat_cache is not None:
        step_keys = ["ind", "ind_pos"]
    else:
        step_keys = ["img", "label", "img_pos", "label_pos"]
        if cfg.use_salience:
            step_keys += ["mask", "mask_pos"]
        if cfg.aug_alignment_weight > 0 and not cfg.device_augs:
            step_keys += ["img_aug", "coord_aug"]

    # Preemption safety (TPU pods are routinely preempted): SIGTERM requests
    # a checkpoint-and-exit after the in-flight step instead of killing the
    # run mid-save. Pairs with resume=true to continue seamlessly. Handlers
    # only install on the main thread (tests may call train() from workers);
    # original handlers are restored on exit.
    import signal
    import threading

    stop_signal: list = []
    prev_handlers = {}
    if (cfg.graceful_shutdown
            and threading.current_thread() is threading.main_thread()):
        def _request_stop(signum, frame):
            print(f"signal {signum} received: will checkpoint and exit "
                  "after the current step")
            stop_signal.append(signum)

        for s in (signal.SIGTERM,):
            prev_handlers[s] = signal.signal(s, _request_stop)

    def _window_clear(s: int) -> bool:
        """True when steps s..s+K-1 may run as ONE dispatch: hist steps and
        profiler-trace boundaries need the single-step path anywhere in the
        window; val/checkpoint/probe-reset/max_steps boundaries are post-step
        actions, so they are fine on the window's LAST step but not interior."""
        if s + k_multi > cfg.max_steps:
            return False
        if cfg.profile_dir and s < 21 and s + k_multi > 10:
            return False  # trace hooks fire at exactly steps 10 and 20
        for j in range(k_multi):
            one = s + j + 1
            if cfg.hist_freq and one % cfg.hist_freq == 0:
                return False
            if j < k_multi - 1:
                if one % cfg.val_freq == 0 or one % cfg.checkpoint_freq == 0:
                    return False
                if cfg.reset_probe_steps is not None and \
                        one == cfg.reset_probe_steps:
                    return False
        return True

    metrics_out: Dict[str, float] = {}
    batches: Iterator = infinite_batches(train_loader)
    imgs_seen = 0
    profiling = False
    # index-batch schedule (multi-step cached mode): refilled every sched_len
    # steps with one host->device transfer
    sched = None
    sched_base = 0
    sched_len = k_multi * 64
    from stego_tpu.parallel.mesh import stacked_batch_sharding

    ssh = stacked_batch_sharding(mesh)
    # try/finally: a mid-loop exception must still restore the signal
    # handlers (they close over THIS run's stop_signal — leaking them breaks
    # library/test callers) and close the logger/checkpoint manager.
    try:
        step_idx = start_step
        while step_idx < cfg.max_steps:
            # profiler trace hooks (SURVEY.md §5): capture steps 10-20 when enabled
            if cfg.profile_dir and step_idx == 10:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            if profiling and step_idx == 20:
                jax.profiler.stop_trace()
                profiling = False

            stacked = None
            if multi_step is not None:
                # device-resident index schedule: draw sched_len steps of
                # index batches from the loader and ship them in ONE
                # transfer — a put per window pays the link's full fixed
                # latency (~150 ms on tunneled hosts, CLAUDE.md), which
                # measured 15x slower than the step itself. Windows AND
                # boundary single-steps slice their rows on device.
                if sched is None or step_idx - sched_base >= sched_len:
                    wins = [next(batches) for _ in range(sched_len)]
                    host = {k: np.stack([np.asarray(w[k]) for w in wins])
                            for k in step_keys if k in wins[0]}
                    if pc > 1:
                        sched = global_batch(mesh, host, sharding=ssh)
                    else:
                        sched = {k: jax.device_put(jnp.asarray(v), ssh)
                                 for k, v in host.items()}
                    sched_base = step_idx
                off = step_idx - sched_base
                if _window_clear(step_idx) and off + k_multi <= sched_len:
                    state, stacked = multi_step(feat_cache, state, sched,
                                                k_steps, step_idx, off)
                    n_done = k_multi
                    metrics = None
                else:
                    dev_batch = {k: _sched_row(v, off)
                                 for k, v in sched.items()}
                    hist_step = bool(cfg.hist_freq) and \
                        (step_idx + 1) % cfg.hist_freq == 0
                    step_fn = train_step_hist if hist_step else train_step
                    state, metrics = step_fn(
                        feat_cache, state, dev_batch,
                        jax.random.fold_in(k_steps, step_idx),
                    )
                    n_done = 1
            else:
                batch = next(batches)
                batch = {k: batch[k] for k in step_keys if k in batch}
                if pc > 1:
                    from stego_tpu.data.loader import compact_batch

                    dev_batch = global_batch(mesh, compact_batch(batch))
                else:
                    dev_batch = _device_batch(batch, bs)
                hist_step = bool(cfg.hist_freq) and \
                    (step_idx + 1) % cfg.hist_freq == 0
                step_fn = train_step_hist if hist_step else train_step
                # cached mode: first positional arg is the feature cache, not
                # the backbone — indices were device_put like any batch above
                first = feat_cache if feat_cache is not None else backbone
                state, metrics = step_fn(
                    first, state, dev_batch,
                    jax.random.fold_in(k_steps, step_idx),
                )
                n_done = 1
            imgs_seen += cfg.batch_size * n_done
            cur = step_idx + n_done - 1

            if cfg.reset_probe_steps is not None and \
                    cur + 1 == cfg.reset_probe_steps:
                print("RESETTING PROBES")
                state = seg.reset_probes(
                    jax.random.fold_in(k_steps, cfg.max_steps + 1), state
                )
                state = jax.device_put(state, rs)

            log_js = [j for j in range(n_done)
                      if (step_idx + j + 1) % cfg.scalar_log_freq == 0]
            if log_js:
                # DEVICE values go straight to the async writer — no fetch in
                # the hot loop (the worker thread pays the transfer latency)
                if stacked is not None:
                    named = {k: v for k, v in stacked.items()
                             if not k.startswith("hist/")}
                    # interior log steps get plain scalars; the window's last
                    # log step carries the rolling imgs_per_sec below
                    for j in log_js[:-1]:
                        logger.log_scalars(
                            step_idx + j + 1,
                            {k: v[j] for k, v in named.items()})
                    j = log_js[-1]
                    host = {k: v[j] for k, v in named.items()}
                else:
                    host = {k: v for k, v in metrics.items()
                            if not k.startswith("hist/")}
                    j = log_js[-1]
                # raw count: the async writer converts to imgs_per_sec from
                # fetch-completion timestamps (device progress, not the
                # host's enqueue rate — the fetch-free loop runs far ahead).
                # NullLogger (non-primary) ignores it.
                host["_imgs_seen"] = float(imgs_seen)
                imgs_seen = 0
                logger.log_scalars(step_idx + j + 1, host)

            if cfg.hist_freq and (cur + 1) % cfg.hist_freq == 0 and metrics:
                for k, v in metrics.items():
                    if k.startswith("hist/"):
                        logger.log_histogram_counts(cur + 1, k, v)

            if (cur + 1) % cfg.val_freq == 0 or cur + 1 == cfg.max_steps:
                metrics_out = run_validation(
                    seg, val_step, backbone, state["params"], val_loader, mesh,
                    val_bs,
                    figure_prefix=(join(log_dir, f"val_{cur + 1}_")
                                   if primary else None),
                    val_cache=val_cache, val_base=val_dataset.dataset,
                    val_epoch=val_epoch,
                )
                logger.log_scalars(cur + 1, metrics_out)
                print(f"step {cur + 1}: " + ", ".join(
                    f"{k}={v:.2f}" for k, v in metrics_out.items()))

            if mgr is not None and ((cur + 1) % cfg.checkpoint_freq == 0 or
                                    cur + 1 == cfg.max_steps):
                mgr.save(cur + 1, jax.device_get(state), metrics=metrics_out)

            if stop_signal:
                if mgr is not None:
                    # force-save regardless of top-k ranking: a preemption
                    # checkpoint must land even if its metrics are worse
                    mgr.save_preemption(cur + 1, jax.device_get(state),
                                        metrics=metrics_out)
                    mgr.wait_until_finished()
                print(f"exiting after step {cur + 1} on signal "
                      f"{stop_signal[0]} (resume=true continues from here)")
                break
            step_idx += n_done
    finally:
        for s, h in prev_handlers.items():
            signal.signal(s, h)
        logger.close()
        if mgr is not None:
            mgr.close()
    return metrics_out


def main(argv=None):
    from stego_tpu.config import prep_args

    overrides = prep_args(argv)
    base = overrides.pop("config", None)
    cfg = (Config.from_yaml(base, **overrides) if base
           else Config.from_dict(overrides, strict=True))
    train(cfg)


if __name__ == "__main__":
    main()
