"""Checkpoint evaluation: flip-TTA, probes, on-device CRF, Hungarian metrics.

Behavioral reference: src/eval_segmentation.py. Differences by design:
the dense CRF runs batched on device (ops/crf.py) instead of a host
multiprocessing pool, and checkpoints load from either this framework's orbax
directories or the reference's released Lightning ``.ckpt`` files (via
models/convert.py) for parity evaluation.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stego_tpu.config import Config
from stego_tpu.data.colormaps import colormap_for_dataset
from stego_tpu.data.contrastive import ContrastiveSegDataset
from stego_tpu.data.loader import DataLoader, effective_threads
from stego_tpu.data.transforms import channel_stats, get_transform
from stego_tpu.models.probes import cluster_lookup, linear_probe_logits
from stego_tpu.models.vit import ViTConfig
from stego_tpu.ops.crf import dense_crf
from stego_tpu.ops.interp import interpolate
from stego_tpu.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from stego_tpu.train.app import _pad_batch, get_class_labels
from stego_tpu.train.segmenter import UnsupervisedSegmenter
from stego_tpu.utils.metrics import UnsupervisedMetrics, update_conf_matrix
from stego_tpu.utils.viz import (
    save_comparison_grid,
    save_confusion_matrix,
    save_prediction_images,
)


def load_model_for_eval(
    model_path: str, vit_cfg: Optional[ViTConfig] = None
) -> Tuple[UnsupervisedSegmenter, Dict, Dict]:
    """Load (segmenter, backbone, params) from either a reference Lightning
    ``.ckpt`` (converted) or one of our orbax checkpoint directories."""
    if model_path.endswith(".ckpt"):
        from stego_tpu.models.convert import load_stego_checkpoint

        loaded = load_stego_checkpoint(model_path, vit_cfg=vit_cfg)
        cfg = Config.from_dict(loaded["cfg_dict"])
        n_classes = _n_classes_for(cfg)
        seg = UnsupervisedSegmenter(n_classes, cfg, vit_cfg=loaded["vit_cfg"])
        backbone = jax.tree.map(jnp.asarray, loaded["backbone"])
        params = {
            "head": jax.tree.map(jnp.asarray, loaded["head"]),
            "linear_probe": jax.tree.map(jnp.asarray, loaded["linear_probe"]),
            "cluster_probe": jax.tree.map(jnp.asarray, loaded["cluster_probe"]),
        }
        return seg, backbone, params

    from stego_tpu.train.checkpoint import CheckpointManager, load_config

    cfg = load_config(model_path)
    n_classes = _n_classes_for(cfg)
    seg = UnsupervisedSegmenter(n_classes, cfg, vit_cfg=vit_cfg)
    mgr = CheckpointManager(model_path, cfg, save_top_k=cfg.save_top_k)
    template = seg.init_state(jax.random.PRNGKey(0))
    step = mgr.best_step() or mgr._mgr.latest_step()
    _, state = mgr.restore(step=step, template=template)
    backbone = mgr.restore_backbone()
    mgr.close()
    # host-localize so callers control device placement (restored arrays can
    # carry whatever sharding they were saved under)
    backbone = jax.tree.map(np.asarray, jax.device_get(backbone))
    params = jax.tree.map(np.asarray, jax.device_get(state["params"]))
    return seg, backbone, params


def _n_classes_for(cfg: Config) -> int:
    from stego_tpu.data.contrastive import dataset_dispatch

    return dataset_dispatch(cfg.dataset_name, cfg.crop_type, cfg)["n_classes"]


def make_eval_step(seg: UnsupervisedSegmenter, run_crf: bool,
                   return_probs: bool = False, with_conf: bool = False):
    """jitted eval step: flip-TTA code (reference eval_segmentation.py:124-126),
    probe log-probs, optional on-device CRF, argmax predictions.
    ``return_probs`` skips on-device CRF/argmax and returns the log-prob maps
    (used by the host-side exact-CRF backend). ``with_conf`` additionally
    returns the device-side confusion matrices — on a multi-process mesh the
    batch reduction makes them replicated global values (implicit psum), so
    every host reads identical metrics without host-side merging (mirrors
    run_validation; reference eval DataParallel, eval_segmentation.py:94-97)."""
    nc = seg.n_classes
    extra = seg.cfg.extra_clusters

    def _confs(linear_preds, cluster_preds, label):
        return (
            update_conf_matrix(jnp.zeros((nc, nc), jnp.int32), linear_preds,
                               label, nc, 0),
            update_conf_matrix(jnp.zeros((nc + extra, nc), jnp.int32),
                               cluster_preds, label, nc, extra),
        )

    def eval_step(backbone, params, img, label):
        from stego_tpu.data.loader import restore_dtypes

        restored = restore_dtypes({"img": img, "label": label})
        img, label = restored["img"], restored["label"]
        # flip-TTA as TWO backbone calls inside this one jitted program.
        # MEASURED faster than concat-into-one-batched-call on v5e
        # (scripts/bench_eval.py: 28.5 vs 33.6 ms at res 320 b=8, 9.8 vs
        # 10.8 ms at res 224): both calls compile into a single XLA program
        # (no extra dispatch), and two independent half-batch chains
        # schedule/pipeline better than one doubled chain.
        _, code1 = seg.net.apply(backbone, params["head"], img, train=False)
        _, code2 = seg.net.apply(backbone, params["head"], img[:, :, ::-1],
                                 train=False)
        code = (code1 + code2[:, :, ::-1]) / 2.0

        if not run_crf and not return_probs:
            # argmax-only path: code-res logits + channel-major upsampled
            # argmax — identical predictions to the interpolate-then-probe
            # order (log_softmax is monotone; bilinear resize commutes with
            # the affine probe; cluster argmax ignores the per-pixel norm),
            # without lane-padded full-res code/prob tensors.
            from stego_tpu.ops.math import l2_normalize
            from stego_tpu.ops.probe_ce import upsampled_argmax

            hw = label.shape[1:3]
            linear_preds = upsampled_argmax(
                linear_probe_logits(params["linear_probe"], code), hw)
            cluster_preds = upsampled_argmax(
                code @ l2_normalize(params["cluster_probe"]["clusters"],
                                    axis=1).T, hw)
            if with_conf:
                return (linear_preds, cluster_preds,
                        *_confs(linear_preds, cluster_preds, label))
            return linear_preds, cluster_preds

        code = interpolate(code, label.shape[1:3], "bilinear",
                           align_corners=False)

        linear_probs = jax.nn.log_softmax(
            linear_probe_logits(params["linear_probe"], code), axis=-1
        )
        cluster_probs = cluster_lookup(params["cluster_probe"], code,
                                       alpha=2.0, log_probs=True)

        # unnormalized RGB for CRF guidance/figures (4-channel potsdam_ir
        # inputs contribute their RGB slice; the bilateral kernel is RGB)
        mean, std = (jnp.asarray(s) for s in channel_stats(img.shape[-1]))
        if return_probs:
            img01 = jnp.clip(img * std + mean, 0.0, 1.0)[..., :3]
            return linear_probs, cluster_probs, img01

        if run_crf:
            img01 = jnp.clip(img * std + mean, 0.0, 1.0)[..., :3]
            linear_preds = jnp.argmax(dense_crf(img01, linear_probs), axis=-1)
            cluster_preds = jnp.argmax(dense_crf(img01, cluster_probs), axis=-1)
        else:
            linear_preds = jnp.argmax(linear_probs, axis=-1)
            cluster_preds = jnp.argmax(cluster_probs, axis=-1)
        if with_conf:
            return (linear_preds, cluster_preds,
                    *_confs(linear_preds, cluster_preds, label))
        return linear_preds, cluster_preds

    return eval_step


def evaluate(
    eval_cfg: Config,
    model_path: str,
    vit_cfg: Optional[ViTConfig] = None,
    val_dataset=None,
    save_outputs: bool = True,
    max_batches: Optional[int] = None,
) -> Dict[str, float]:
    """Evaluate one checkpoint; returns final/ metrics
    (reference my_app loop, eval_segmentation.py:57-214)."""
    seg, backbone, params = load_model_for_eval(model_path, vit_cfg=vit_cfg)
    model_cfg = seg.cfg

    if val_dataset is None:
        val_dataset = ContrastiveSegDataset(
            pytorch_data_dir=eval_cfg.pytorch_data_dir,
            dataset_name=model_cfg.dataset_name,
            crop_type=None,
            image_set="val",
            transform=get_transform(eval_cfg.res, False, "center"),
            target_transform=get_transform(eval_cfg.res, True, "center"),
            cfg=model_cfg,
        )

    mesh = make_mesh(eval_cfg.num_devices)
    if mesh.devices.size > 1:
        # rebuild with the mesh so the attention kernels run per batch shard
        seg = UnsupervisedSegmenter(seg.n_classes, seg.cfg,
                                    vit_cfg=seg.vit_cfg, mesh=mesh)
    bs_shard = batch_sharding(mesh)
    rs = replicated_sharding(mesh)
    if seg.cfg.backbone_dtype == "bfloat16":
        # bf16 storage for the block matmul weights: bitwise-identical
        # compute, no per-step f32->bf16 weight conversion (round-5 profile)
        from stego_tpu.models.vit import cast_params_for_compute

        backbone = cast_params_for_compute(backbone, jnp.bfloat16)
    backbone = jax.device_put(backbone, rs)
    params = jax.device_put(params, rs)

    batch_size = eval_cfg.batch_size * 2  # reference eval loader batching (:88)
    d = mesh.devices.size
    batch_size = max(d, (batch_size // d) * d)
    # multi-process: each host decodes its stripe of the val set and the
    # global batch is assembled over the mesh — a pod evaluates the set ONCE
    # (round 2 had every process re-evaluate the full set). Mirrors the
    # train loop (train/app.py) and the reference's eval DataParallel
    # (eval_segmentation.py:94-97).
    pc, pi = jax.process_count(), jax.process_index()
    loader = DataLoader(val_dataset, batch_size // pc, shuffle=False,
                        drop_last=False, num_shards=pc, shard_index=pi,
                        num_threads=effective_threads(eval_cfg.num_workers))

    exact_crf = eval_cfg.run_crf and eval_cfg.crf_backend == "exact"
    if exact_crf and pc > 1:
        raise ValueError(
            "crf_backend=exact runs host-side per process and cannot merge "
            "metrics across processes; use crf_backend=grid for multi-host "
            "eval")
    eval_step = jax.jit(make_eval_step(seg, eval_cfg.run_crf,
                                       return_probs=exact_crf,
                                       with_conf=not exact_crf))

    # optional PiCIE baseline comparison rows
    # (reference eval_segmentation.py:70-75,143-145)
    picie = None
    if eval_cfg.run_picie and model_cfg.dataset_name == "cocostuff27":
        from stego_tpu.models.picie import load_picie_checkpoint, picie_features
        from stego_tpu.models.probes import cluster_lookup as _cl

        try:
            picie_state = load_picie_checkpoint(
                join("saved_models", "picie_and_probes.pth"))
            picie_metrics = UnsupervisedMetrics("picie/", seg.n_classes, 0,
                                                True)
            if "cluster_stats" in picie_state:
                picie_metrics.merge_stats(picie_state["cluster_stats"])
                picie_metrics.compute()

            def picie_step(img):
                feats = picie_features(picie_state["backbone"],
                                       picie_state["decoder"], img)
                _, probs = _cl(picie_state["cluster_probe"], feats, alpha=None)
                return jnp.argmax(probs, axis=-1)

            picie = (jax.jit(picie_step), picie_metrics)
        except (FileNotFoundError, RuntimeError) as e:
            print(f"PiCIE comparison disabled: {e}")

    linear_metrics = UnsupervisedMetrics("final/linear/", seg.n_classes, 0,
                                         False)
    cluster_metrics = UnsupervisedMetrics(
        "final/cluster/", seg.n_classes, model_cfg.extra_clusters, True
    )

    saved: Dict[str, list] = {"img": [], "label": [], "cluster": [],
                              "linear": [], "picie": []}
    n_keep = eval_cfg.n_images
    conf_sums = None  # device-resident epoch accumulators (fetched ONCE —
    # a per-batch np.asarray(conf) is a ~30 ms round trip on tunneled hosts)
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        batch = _pad_batch(batch, batch_size // pc)
        from stego_tpu.data.loader import compact_batch

        compact = compact_batch({"img": np.asarray(batch["img"]),
                                 "label": np.asarray(batch["label"])})
        if pc > 1:
            from stego_tpu.parallel.multihost import global_batch

            dev = global_batch(mesh, compact)
            img, label = dev["img"], dev["label"]
        else:
            img = jax.device_put(jnp.asarray(compact["img"]), bs_shard)
            label = jax.device_put(jnp.asarray(compact["label"]), bs_shard)
        if exact_crf:
            from stego_tpu.ops.crf_exact import dense_crf_exact_batch_multi

            lp, cp, img01 = eval_step(backbone, params, img, label)
            # one call: the bilateral lattice (the dominant per-image cost)
            # is built once per image and shared by both probes' logits
            lprob, cprob = dense_crf_exact_batch_multi(
                np.asarray(img01), [np.asarray(lp), np.asarray(cp)])
            linear_preds = lprob.argmax(-1)
            cluster_preds = cprob.argmax(-1)
            linear_metrics.update(np.asarray(linear_preds),
                                  np.asarray(batch["label"]))
            cluster_metrics.update(np.asarray(cluster_preds),
                                   np.asarray(batch["label"]))
        else:
            linear_preds, cluster_preds, conf_l, conf_c = eval_step(
                backbone, params, img, label)
            # replicated global conf matrices (implicit psum over the mesh),
            # accumulated on device across batches
            conf_sums = ((conf_l, conf_c) if conf_sums is None
                         else (conf_sums[0] + conf_l, conf_sums[1] + conf_c))
        if pc == 1 and len(saved["img"]) < n_keep:
            take = min(n_keep - len(saved["img"]), len(batch["img"]))
            saved["img"].extend(np.asarray(batch["img"][:take]))
            saved["label"].extend(np.asarray(batch["label"][:take]))
            saved["cluster"].extend(np.asarray(cluster_preds[:take]))
            saved["linear"].extend(np.asarray(linear_preds[:take]))
            if picie is not None:
                picie_step, picie_metrics = picie
                ppreds = np.asarray(picie_step(img))[:take]
                if picie_metrics.assignments is not None:
                    ppreds = picie_metrics.map_clusters(ppreds)
                saved["picie"].extend(
                    np.asarray(interpolate(
                        jnp.asarray(ppreds[..., None], jnp.float32),
                        label.shape[1:3], "nearest"))[..., 0].astype(np.int64))

    if conf_sums is not None:
        linear_metrics.merge_stats(np.asarray(conf_sums[0]))
        cluster_metrics.merge_stats(np.asarray(conf_sums[1]))
    metrics = {**linear_metrics.compute(), **cluster_metrics.compute()}
    print(model_path)
    print(metrics)

    if save_outputs and saved["img"]:
        result_dir = join("results", "predictions", eval_cfg.experiment_name)
        os.makedirs(result_dir, exist_ok=True)
        cmap = colormap_for_dataset(model_cfg.dataset_name)
        imgs = np.stack(saved["img"])
        labels = np.stack(saved["label"])
        clusters = cluster_metrics.map_clusters(np.stack(saved["cluster"]))
        linears = np.stack(saved["linear"])
        save_prediction_images(result_dir, imgs, labels, clusters, linears,
                               cmap)
        rows = {"Image": imgs, "Label": labels, "STEGO\n(Ours)": clusters}
        if saved["picie"]:
            rows["PiCIE\n(Baseline)"] = np.stack(saved["picie"])
        save_comparison_grid(
            join(result_dir, "comparison.png"), rows,
            cmap, dark_mode=eval_cfg.dark_mode,
        )
        try:
            names = get_class_labels(model_cfg.dataset_name)
        except ValueError:
            names = [str(i) for i in range(seg.n_classes)]
        if model_cfg.extra_clusters:
            names = names + ["Extra"]
        save_confusion_matrix(
            join(result_dir, "conf_matrix.png"),
            cluster_metrics.histogram, names, dark_mode=eval_cfg.dark_mode,
        )
    return metrics


def main(argv=None):
    from stego_tpu.config import prep_args

    overrides = prep_args(argv)
    base = overrides.pop("config", None)
    model_paths = overrides.pop("model_paths", None)
    model_path = overrides.pop("model_path", None)
    cfg = (Config.from_yaml(base, **overrides) if base
           else Config.from_dict(overrides, strict=True))
    paths = cfg.model_paths or ([model_path] if model_path else [])
    if model_paths:
        paths = model_paths.split(",") if isinstance(model_paths, str) \
            else model_paths
    if not paths:
        raise SystemExit("pass model_path=<ckpt dir or .ckpt file>")
    for p in paths:
        evaluate(cfg, p)


if __name__ == "__main__":
    main()
