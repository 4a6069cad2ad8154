"""Training runtime: model assembly + jitted train/val steps.

Behavioral reference: LitUnsupervisedSegmenter (src/train_segmentation.py:53-383).
TPU-native design:

* ONE jitted train step holds the whole update: frozen-backbone forward for the
  (img, img_pos) pair **batched into a single ViT call**, the contrastive
  correlation loss, probe losses on stop_gradient'ed code, and three Adam
  updates (net 5e-4, linear/cluster probes 5e-3, mirroring
  train_segmentation.py:379-381). XLA fuses the lot; there is no
  Python-side optimizer choreography per step.
* Sharded over a 1-D ``data`` mesh: batch split over ICI, params replicated,
  gradient/metric reductions are XLA collectives (replaces Lightning DDP).
* Validation accumulates confusion matrices on device (implicit psum) and only
  the Hungarian assignment runs on host (utils/metrics.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from stego_tpu.config import Config
from stego_tpu.models.featurizer import DinoFeaturizer, dropout2d
from stego_tpu.models.probes import (
    cluster_lookup,
    decoder_apply,
    init_cluster_probe,
    init_decoder,
    init_linear_probe,
    linear_probe_logits,
)
from stego_tpu.models.vit import VIT_CONFIGS, ViTConfig
from stego_tpu.ops.correlation import CorrLossCfg, contrastive_correlation_loss
from stego_tpu.ops.crf_loss import CRFLossCfg, contrastive_crf_loss
from stego_tpu.ops.interp import interpolate
from stego_tpu.ops.math import l2_normalize, one_hot_feats
from stego_tpu.ops.probe_ce import upsampled_masked_cross_entropy
from stego_tpu.ops.sampling import sample_from_coords
from stego_tpu.utils.metrics import update_conf_matrix

Params = Dict[str, Any]


def masked_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, n_classes: int
) -> jnp.ndarray:
    """Pixel CE over ``0 <= label < n_classes`` (reference
    train_segmentation.py:210-218)."""
    mask = (labels >= 0) & (labels < n_classes)
    safe = jnp.clip(labels, 0, n_classes - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, nll, 0.0)) / denom


class UnsupervisedSegmenter:
    """Static model assembly (no parameters held)."""

    def __init__(self, n_classes: int, cfg: Config,
                 vit_cfg: Optional[ViTConfig] = None, mesh=None):
        self.cfg = cfg
        self.n_classes = n_classes
        # >1-device data mesh: Pallas kernels (attention, fused correlation
        # loss, full-field mode) run per batch shard via shard_map — the
        # single-chip fast paths survive any mesh size (reference DDP keeps
        # its per-GPU path likewise, train_segmentation.py:476).
        self.mesh = mesh if (mesh is not None and mesh.devices.size > 1) \
            else None
        self.dim = cfg.dim if cfg.continuous else n_classes
        if vit_cfg is None and cfg.arch == "dino":
            vit_cfg = VIT_CONFIGS[cfg.model_type][cfg.dino_patch_size]
        if vit_cfg is not None and getattr(cfg, "potsdam_ir", False):
            import dataclasses

            vit_cfg = dataclasses.replace(vit_cfg, in_chans=4)
        self.vit_cfg = vit_cfg
        backbone_dtype = (
            jnp.bfloat16 if cfg.backbone_dtype == "bfloat16" else jnp.float32
        )
        if cfg.arch == "feature-pyramid":
            from stego_tpu.models.fpn import FeaturePyramidNet

            self.net = FeaturePyramidNet(
                cfg.granularity, self.dim, cfg.continuous,
                backbone_dtype=backbone_dtype,
            )
        elif cfg.arch == "dino":
            self.net = DinoFeaturizer(
                vit_cfg,
                dim=self.dim,
                feat_type=cfg.dino_feat_type,
                projection_type=cfg.projection_type,
                use_dropout=cfg.dropout,
                backbone_dtype=backbone_dtype,
                use_flash_attention=cfg.use_flash_attention,
                mesh=self.mesh,
            )
        else:
            raise ValueError(f"Unknown arch {cfg.arch}")
        # negatives_scope=local on a mesh: one negative derangement per batch
        # shard (block_local_super_perm with mesh-size blocks) — the
        # reference's per-process DDP semantics, and the property that lets
        # the fused-sampling kernel run per-shard (see _resolve_corr_sampling)
        self.neg_blocks = (self.mesh.devices.size
                           if (cfg.negatives_scope == "local"
                               and self.mesh is not None) else 1)
        self.corr_cfg = CorrLossCfg.from_config(cfg,
                                                neg_blocks=self.neg_blocks)
        self.crf_cfg = CRFLossCfg(
            n_samples=cfg.crf_samples, alpha=cfg.alpha, beta=cfg.beta,
            gamma=cfg.gamma, w1=cfg.w1, w2=cfg.w2, shift=cfg.shift,
        )

    # ------------------------------------------------------------------
    def init_params(self, key: jax.Array) -> Params:
        """Trainable params (reference train_segmentation.py:69-78)."""
        ks = jax.random.split(key, 5)
        return {
            "head": self.net.init_head(ks[0]),
            "linear_probe": init_linear_probe(ks[1], self.dim, self.n_classes),
            "cluster_probe": init_cluster_probe(
                ks[2], self.dim, self.n_classes + self.cfg.extra_clusters
            ),
            "train_cluster_probe": init_cluster_probe(ks[3], self.dim,
                                                      self.n_classes),
            "decoder": init_decoder(ks[4], self.dim, self.net.n_feats),
        }

    def make_optimizers(self) -> Dict[str, optax.GradientTransformation]:
        """Adam trio (reference configure_optimizers,
        train_segmentation.py:373-383)."""
        return {
            "net": optax.adam(self.cfg.lr),
            "linear": optax.adam(5e-3),
            "cluster": optax.adam(5e-3),
        }

    def init_state(self, key: jax.Array) -> Dict[str, Any]:
        params = self.init_params(key)
        opts = self.make_optimizers()
        return {
            "params": params,
            "opt": {
                "net": opts["net"].init(self._net_group(params)),
                "linear": opts["linear"].init(params["linear_probe"]),
                "cluster": opts["cluster"].init(params["cluster_probe"]),
            },
            "step": jnp.zeros((), jnp.int32),
        }

    def _net_group(self, params: Params) -> Params:
        """Params owned by the net optimizer: head (+ decoder when the
        reconstruction loss is on; train_segmentation.py:374-377)."""
        g = {"head": params["head"]}
        if self.cfg.rec_weight > 0:
            g["decoder"] = params["decoder"]
        return g

    def reset_probes(self, key: jax.Array, state: Dict[str, Any]) -> Dict[str, Any]:
        """reset_probe_steps parity (train_segmentation.py:232-237): reinit
        probes and give them fresh optimizers."""
        k1, k2 = jax.random.split(key)
        params = dict(state["params"])
        params["linear_probe"] = init_linear_probe(k1, self.dim, self.n_classes)
        params["cluster_probe"] = init_cluster_probe(
            k2, self.dim, self.n_classes + self.cfg.extra_clusters
        )
        opts = self.make_optimizers()
        opt = dict(state["opt"])
        opt["linear"] = opts["linear"].init(params["linear_probe"])
        opt["cluster"] = opts["cluster"].init(params["cluster_probe"])
        return {**state, "params": params, "opt": opt}


def _corr_pair_losses(seg, cfg, key, signal, signal_pos, code, code_pos,
                      salience, salience_pos, with_hist=True,
                      sampling_impl="auto"):
    if cfg.use_pallas_loss or cfg.full_field_loss:
        from stego_tpu.ops.pallas_corr import contrastive_correlation_loss_fused

        out = contrastive_correlation_loss_fused(
            seg.corr_cfg, key, signal, signal_pos, code, code_pos,
            salience, salience_pos, full_field=cfg.full_field_loss,
            mesh=seg.mesh,
            return_cd_tensors=with_hist and not cfg.full_field_loss,
            # feature-side (stop-grad) tiles in bf16 when the features come
            # from a bf16 trunk anyway; code-side dots stay f32 for grads
            # unless pallas_loss_bf16 opts in (kernel-internal cast)
            feat_dtype=(jnp.bfloat16 if cfg.backbone_dtype == "bfloat16"
                        else jnp.float32),
            code_bf16=cfg.pallas_loss_bf16,
            sampling_impl=sampling_impl,
        )
    else:
        out = contrastive_correlation_loss(
            seg.corr_cfg, key, signal, signal_pos, code, code_pos,
            salience, salience_pos, sampling_impl=sampling_impl,
        )
    corr_loss = (
        cfg.pos_inter_weight * out["pos_inter_loss"]
        + cfg.pos_intra_weight * out["pos_intra_loss"]
        + cfg.neg_inter_weight * jnp.mean(out["neg_inter_loss"])
    ) * cfg.correspondence_weight
    metrics = {
        "loss/pos_intra": out["pos_intra_loss"],
        "loss/pos_inter": out["pos_inter_loss"],
        "loss/neg_inter": jnp.mean(out["neg_inter_loss"]),
        "cd/pos_intra": jnp.mean(out["pos_intra_cd"]),
        "cd/pos_inter": jnp.mean(out["pos_inter_cd"]),
        "cd/neg_inter": jnp.mean(out["neg_inter_cd"]),
    }
    # cd histograms (reference logs them every hist_freq steps,
    # train_segmentation.py:165-168): binned ON DEVICE so only 64 counts per
    # pair type leave the chip. NOT jnp.histogram — its searchsorted lowering
    # costs ~20 ms/call on TPU; a one-hot reduction is ~free. cd values are
    # clipped so the exact-±1 cosines (pos_intra diagonal) land in edge bins
    # deterministically. The fused Pallas path reports means only.
    # with_hist=False builds a step WITHOUT any of this (the app dispatches
    # the hist variant only on hist_freq steps — 99% of steps skip the
    # observability work nobody reads).
    if with_hist:
        for name in ("pos_intra_cd", "pos_inter_cd", "neg_inter_cd"):
            cd = out[name]
            if cd.ndim > 0:
                idx = jnp.clip(
                    jnp.floor((jnp.clip(cd.ravel(), -1.0, 1.0) + 1.0) * 32.0)
                    .astype(jnp.int32), 0, 63,
                )
                counts = jnp.sum(jax.nn.one_hot(idx, 64, dtype=jnp.int32),
                                 axis=0)
                metrics[f"hist/{name.replace('_cd', '')}"] = counts
    return corr_loss, metrics


def _resolve_corr_sampling(seg: UnsupervisedSegmenter, fallback: str) -> str:
    """Pick the correlation loss's sampler implementation.

    Measured ladder on v5e (round 4, scripts/bench_fused_sampling.py +
    /tmp A/B in the round-4 commit): the in-kernel-sampling fused path wins
    BOTH step families — cached K=16 2.17 -> 1.75 ms, image step b=16
    18.19 -> 16.76 ms (gather 18.19, matmul 17.05 after the per-k-groups
    change removed the negatives' tiling). It needs the Pallas loss, sampled
    (not full-field) mode, and — on a >1-device mesh — shard-local negatives
    (negatives_scope='local'; the kernel reads negative rows by index inside
    the shard, so global perms cannot cross shards — round 5 made the mesh
    path live via shard_map). ``fallback`` is each step family's measured
    winner otherwise (image="gather", cached="auto"->matmul).
    ``pallas_loss_bf16`` routes to the streamed path, which honors the flag
    (the fused-sampling kernel's code side is f32 end-to-end).
    """
    cfg = seg.cfg
    multi = seg.mesh is not None and seg.mesh.devices.size > 1
    mesh_ok = (not multi) or cfg.negatives_scope == "local"
    fused_ok = (cfg.use_pallas_loss and not cfg.full_field_loss
                and cfg.correspondence_weight > 0 and mesh_ok
                and not cfg.pallas_loss_bf16)
    if cfg.fused_sampling == "on":
        if not fused_ok:
            raise ValueError(
                "fused_sampling='on' needs use_pallas_loss, sampled (not "
                "full_field) correspondence loss, no pallas_loss_bf16, and "
                "negatives_scope='local' on a >1-device mesh")
        return "fused"
    if (cfg.fused_sampling == "auto" and fused_ok
            and jax.default_backend() == "tpu"):
        return "fused"
    return fallback


def _split_step_keys(key: jax.Array):
    """The train step's 8-way key split, shared by the image and the
    feature-cache step variants so both consume the identical key sequence
    (the cached-step equivalence tests rely on it)."""
    names = ("head1", "head2", "feat1", "feat2", "corr", "crf", "head3", "aug")
    return dict(zip(names, jax.random.split(key, 8)))


def _update_from_feats(seg: UnsupervisedSegmenter, opts, with_hist: bool,
                       state: Dict[str, Any], ks: Dict[str, jax.Array],
                       image_feat, image_feat_pos, image_feat_aug,
                       batch: Dict[str, Any], sampling_impl: str = "auto"):
    """Everything after the frozen backbone: head code, losses, gradients, the
    three Adam updates (reference training_step below its net() calls,
    train_segmentation.py:134-230). ``batch`` carries label and — as the
    configured losses demand — label_pos / mask / mask_pos / coord_aug / img.
    Shared by :func:`make_train_step` (features from images in-step) and
    :func:`make_cached_train_step` (features gathered from the device cache).

    ``sampling_impl`` picks the grid-sample form for the loss's coordinate
    draws (ops/sampling.py). Measured on v5e: the matmul form wins inside the
    cached step (3.53 -> 2.12 ms/step at steps_per_dispatch=16) but LOSES
    inside the image step (22.3 -> 23.7 ms — the serializing gathers overlap
    the trunk's DMA/MXU schedule there, the extra matmuls don't), so each
    step builder passes its measured winner.
    """
    cfg = seg.cfg
    use_pos = cfg.correspondence_weight > 0
    use_aug = image_feat_aug is not None
    label = batch["label"]

    def loss_fn(trainable: Params):
        metrics: Dict[str, jnp.ndarray] = {}
        code = seg.net.head_code(trainable["head"], image_feat, train=True,
                                 rng=ks["head1"])
        feats = seg.net.signal(image_feat)
        if cfg.dropout and seg.net.use_dropout:
            feats = dropout2d(feats, seg.net.dropout_p, ks["feat1"])
        loss = jnp.zeros((), jnp.float32)

        if use_pos:
            code_pos = seg.net.head_code(trainable["head"], image_feat_pos,
                                         train=True, rng=ks["head2"])
            feats_pos = seg.net.signal(image_feat_pos)
            if cfg.dropout and seg.net.use_dropout:
                feats_pos = dropout2d(feats_pos, seg.net.dropout_p,
                                      ks["feat2"])
            if cfg.use_true_labels:
                signal = one_hot_feats(label + 1, seg.n_classes + 1)
                signal_pos = one_hot_feats(batch["label_pos"] + 1,
                                           seg.n_classes + 1)
            else:
                signal, signal_pos = feats, feats_pos
            salience = batch.get("mask") if cfg.use_salience else None
            salience_pos = batch.get("mask_pos") if cfg.use_salience else None
            corr_loss, corr_metrics = _corr_pair_losses(
                seg, cfg, ks["corr"], signal, signal_pos, code, code_pos,
                salience, salience_pos, with_hist=with_hist,
                sampling_impl=sampling_impl,
            )
            loss = loss + corr_loss
            metrics.update(corr_metrics)

        if cfg.rec_weight > 0:
            rec_feats = decoder_apply(trainable["decoder"], code)
            rec_loss = -jnp.mean(jnp.sum(
                l2_normalize(rec_feats) * l2_normalize(feats), axis=-1
            ))
            loss = loss + cfg.rec_weight * rec_loss
            metrics["loss/rec"] = rec_loss

        if use_aug:
            code_aug = seg.net.head_code(trainable["head"], image_feat_aug,
                                         train=True, rng=ks["head3"])
            hw = code_aug.shape[1:3]
            coord_small = interpolate(batch["coord_aug"], hw, "bilinear",
                                      align_corners=False)
            # reference sample() quirk: the dataset stores (y, x) coords and
            # sample() transposes the grid — the two swaps cancel on square
            # inputs (train_segmentation.py:189-198, data.py:530-532).
            # "fused" exists only for the correlation loss; the aug resample
            # is a plain grid_sample.
            aug_impl = "auto" if sampling_impl == "fused" else sampling_impl
            resampled = sample_from_coords(code, coord_small, impl=aug_impl)
            aug_alignment = -jnp.mean(jnp.sum(
                l2_normalize(resampled) * l2_normalize(code_aug), axis=-1
            ))
            loss = loss + cfg.aug_alignment_weight * aug_alignment
            metrics["loss/aug_alignment"] = aug_alignment

        if cfg.crf_weight > 0:
            crf = jnp.mean(contrastive_crf_loss(
                seg.crf_cfg, ks["crf"],
                interpolate(batch["img"], 56, "bilinear",
                            align_corners=False),
                l2_normalize(
                    interpolate(code, 56, "bilinear", align_corners=False)
                ),
            ))
            loss = loss + cfg.crf_weight * crf
            metrics["loss/crf"] = crf

        detached_code = jax.lax.stop_gradient(code)

        linear_logits = linear_probe_logits(trainable["linear_probe"],
                                            detached_code)
        # Fused channel-major upsample+CE (reference
        # train_segmentation.py:210-218): the naive NHWC chain was ~12 ms
        # of the step — the ~27-class lane axis pads to 128 on every
        # (B, res, res, C) pass (ops/probe_ce.py). bf16 upsample traffic
        # for bf16 trunks; f32 trunks keep exact parity.
        ce_dtype = (jnp.bfloat16 if cfg.backbone_dtype == "bfloat16"
                    else jnp.float32)
        linear_loss = upsampled_masked_cross_entropy(
            linear_logits, label, seg.n_classes, compute_dtype=ce_dtype)
        loss = loss + linear_loss
        metrics["loss/linear"] = linear_loss

        cluster_loss, _ = cluster_lookup(trainable["cluster_probe"],
                                         detached_code, alpha=None)
        loss = loss + cluster_loss
        metrics["loss/cluster"] = cluster_loss
        metrics["loss/total"] = loss
        return loss, metrics

    params = state["params"]
    trainable = {
        "head": params["head"],
        "linear_probe": params["linear_probe"],
        "cluster_probe": params["cluster_probe"],
        "decoder": params["decoder"],
    }
    grads, metrics = jax.grad(loss_fn, has_aux=True)(trainable)

    net_group = {"head": params["head"]}
    net_grads = {"head": grads["head"]}
    if cfg.rec_weight > 0:
        net_group["decoder"] = params["decoder"]
        net_grads["decoder"] = grads["decoder"]
    net_up, net_opt = opts["net"].update(net_grads, state["opt"]["net"],
                                         net_group)
    net_new = optax.apply_updates(net_group, net_up)

    lin_up, lin_opt = opts["linear"].update(
        grads["linear_probe"], state["opt"]["linear"], params["linear_probe"]
    )
    lin_new = optax.apply_updates(params["linear_probe"], lin_up)

    clu_up, clu_opt = opts["cluster"].update(
        grads["cluster_probe"], state["opt"]["cluster"],
        params["cluster_probe"]
    )
    clu_new = optax.apply_updates(params["cluster_probe"], clu_up)

    new_params = dict(params)
    new_params["head"] = net_new["head"]
    if cfg.rec_weight > 0:
        new_params["decoder"] = net_new["decoder"]
    new_params["linear_probe"] = lin_new
    new_params["cluster_probe"] = clu_new

    if getattr(seg.net, "has_bn_state", False):
        # refresh BatchNorm running statistics (FPN arm; torch BN buffers
        # are updated on the train-mode forward — here after the optimizer
        # step, gradient-free)
        new_params["head"] = seg.net.bn_state_update(new_params["head"],
                                                     image_feat)

    new_state = {
        "params": new_params,
        "opt": {"net": net_opt, "linear": lin_opt, "cluster": clu_opt},
        "step": state["step"] + 1,
    }
    return new_state, metrics


def make_train_step(seg: UnsupervisedSegmenter, with_hist: bool = True):
    """Build the jittable train step.

    Step signature: (backbone_params, state, batch, key) -> (state, metrics).
    ``batch`` is a dict of NHWC arrays: img, label [, img_pos, label_pos, mask,
    mask_pos, img_aug, coord_aug].

    ``with_hist=False`` builds the production variant WITHOUT cd-histogram
    binning (and without the fused path's cd-tensor recomputation): the app
    jits both variants and dispatches the hist one only every ``hist_freq``
    steps, so the hot step never pays for observability that is read 1% of
    the time (reference logs hists at the same cadence,
    train_segmentation.py:144,165-168).
    """
    cfg = seg.cfg
    opts = seg.make_optimizers()
    use_pos = cfg.correspondence_weight > 0

    def train_step(backbone: Params, state: Dict[str, Any], batch: Dict[str, Any],
                   key: jax.Array):
        from stego_tpu.data.loader import restore_dtypes

        batch = restore_dtypes(batch)
        img = batch["img"]
        ks = _split_step_keys(key)

        use_aug = cfg.aug_alignment_weight > 0
        if use_aug:
            if cfg.device_augs and "img_aug" not in batch:
                # TPU-native augmented view: RandomResizedCrop+flip+jitter run
                # inside the jitted step (the host path costs ~160 ms/image on
                # a single core; ops/augment.py)
                from stego_tpu.ops.augment import device_augment

                img_aug, coord_aug = device_augment(ks["aug"], img)
            else:
                img_aug, coord_aug = batch["img_aug"], batch["coord_aug"]
        else:
            img_aug = coord_aug = None

        # Frozen backbone forward — img, img_pos, and img_aug in ONE batched
        # call (better MXU utilization than three dispatches).
        bsz = img.shape[0]
        parts = [img]
        if use_pos:
            parts.append(batch["img_pos"])
        if use_aug:
            parts.append(img_aug)
        if len(parts) > 1:
            feat_all = seg.net.backbone_features(
                backbone, jnp.concatenate(parts, axis=0))
            chunks = []
            for i in range(len(parts)):
                chunks.append(jax.tree.map(
                    lambda a, i=i: a[i * bsz:(i + 1) * bsz], feat_all))
        else:
            chunks = [seg.net.backbone_features(backbone, img)]
        image_feat = chunks[0]
        image_feat_pos = chunks[1] if use_pos else None
        image_feat_aug = chunks[-1] if use_aug else None

        if use_aug:
            batch = dict(batch, coord_aug=coord_aug)
        # fused in-kernel sampling when available (880 -> 955 imgs/s b=16);
        # otherwise "gather", which beat the matmul sampler inside the
        # round-3 image step (see _resolve_corr_sampling)
        return _update_from_feats(seg, opts, with_hist, state, ks,
                                  image_feat, image_feat_pos, image_feat_aug,
                                  batch,
                                  sampling_impl=_resolve_corr_sampling(
                                      seg, "gather"))

    return train_step


def make_cached_train_step(seg: UnsupervisedSegmenter, with_hist: bool = True):
    """Train step over a device-resident frozen-backbone feature cache.

    The backbone never trains (reference no-grad region, src/modules.py:85);
    under a deterministic loader transform every epoch recomputes identical
    features, so ``cache_backbone_feats=true`` runs the backbone ONCE
    (train/feat_cache.py) and each step gathers its batch from HBM instead:

    Step signature: (cache, state, batch, key) -> (state, metrics) where
    ``batch`` holds only int32 ``ind`` (+ ``ind_pos``) index vectors — the
    host->device wire carries ~8 bytes per image instead of ~37 KB. The key
    split, dropout, coordinate sampling, losses, and optimizer updates are
    IDENTICAL to :func:`make_train_step` (shared ``_update_from_feats``), so
    cached and uncached runs are step-for-step equivalent given equal
    features (tests/test_feat_cache.py asserts it).

    On a >1-device mesh the cache is replicated and the index vectors are
    batch-sharded: ``jnp.take`` partitions like the batch, so the gathered
    features feed the shard_map'd Pallas kernels exactly as decoded images
    would.
    """
    cfg = seg.cfg
    opts = seg.make_optimizers()
    use_pos = cfg.correspondence_weight > 0

    def train_step(cache: Dict[str, Any], state: Dict[str, Any],
                   batch: Dict[str, Any], key: jax.Array):
        ks = _split_step_keys(key)
        ind = batch["ind"]

        if cfg.feat_cache_sharded:
            from stego_tpu.parallel.mesh import sharded_row_take

            def take(a, i):
                return sharded_row_take(a, i, seg.mesh)
        else:
            def take(a, i):
                return jnp.take(a, i, axis=0)

        image_feat = jax.tree.map(lambda a: take(a, ind), cache["feats"])
        sub: Dict[str, Any] = {
            "label": take(cache["label"], ind).astype(jnp.int32)
        }
        image_feat_pos = None
        if use_pos:
            ind_pos = batch["ind_pos"]
            image_feat_pos = jax.tree.map(lambda a: take(a, ind_pos),
                                          cache["feats"])
            sub["label_pos"] = take(cache["label"], ind_pos).astype(jnp.int32)
            if cfg.use_salience:
                sub["mask"] = take(cache["mask"], ind).astype(jnp.float32)
                sub["mask_pos"] = take(cache["mask"],
                                       ind_pos).astype(jnp.float32)
        # fused in-kernel sampling when available (7364 -> 9156 imgs/s at
        # K=16); otherwise "auto"->matmul, which beat the serializing
        # gathers in the trunk-less cached step (3.53 -> 2.12 ms at K=16;
        # see _resolve_corr_sampling / _update_from_feats docstrings)
        return _update_from_feats(seg, opts, with_hist, state, ks,
                                  image_feat, image_feat_pos, None, sub,
                                  sampling_impl=_resolve_corr_sampling(
                                      seg, "auto"))

    return train_step


def make_cached_multi_step(seg: UnsupervisedSegmenter, n_steps: int,
                           with_hist: bool = False):
    """``n_steps`` cached train steps in ONE dispatch (``lax.scan``).

    A cached step's input is two (B,) int32 index vectors, so a window of K
    steps rides a single device dispatch — on hosts where per-dispatch
    latency rivals the 3 ms on-device step (remote-tunneled chips measure
    ~2 ms/dispatch; even PCIe hosts pay ~0.1 ms) this recovers nearly the
    full device rate. Measured on v5e via the tunnel: 5.07 -> 3.56 ms/step
    at K=16 (scripts/bench_cached.py).

    Signature: ``(cache, state, batch, key, start_step) -> (state, metrics)``
    where ``batch`` holds (K, B) index stacks, ``key`` is the RUN-level key
    (NOT pre-folded), and ``start_step`` is the absolute index of the window's
    first step. Sub-step j folds ``key`` by ``start_step + j`` — the exact
    per-step key sequence of the single-step path (train/app.py:509-512), so
    a K-step window is bitwise-identical to K single dispatches
    (tests/test_feat_cache.py). Metrics come back stacked (K,) per scalar so
    the app can honor any scalar_log_freq inside the window.
    """
    single = make_cached_train_step(seg, with_hist=with_hist)

    def multi_step(cache: Dict[str, Any], state: Dict[str, Any],
                   batch: Dict[str, Any], key: jax.Array,
                   start_step: jax.Array, offset: jax.Array = 0):
        """``batch`` may hold MORE than K stacked steps: ``offset`` selects
        the window's first row on device (lax.dynamic_slice). The app ships a
        whole schedule of index batches in ONE host->device transfer and
        slices windows from it — per-window puts pay the link's full fixed
        latency on tunneled hosts (~150 ms measured; CLAUDE.md) and even
        PCIe dispatch overhead otherwise."""
        window = jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, offset, n_steps,
                                                   axis=0), batch)

        def body(st, xs):
            j, sub = xs
            return single(cache, st, sub, jax.random.fold_in(key,
                                                             start_step + j))

        xs = (jnp.arange(n_steps), window)
        return jax.lax.scan(body, state, xs)

    return multi_step


def make_cached_val_step(seg: UnsupervisedSegmenter):
    """Validation step over a feature cache built at ``val_res``.

    Signature: (cache, params, batch) -> same outputs as
    :func:`make_val_step`; ``batch`` holds only int32 ``ind``. Training-time
    validation re-runs the frozen backbone over the SAME deterministic val
    split every ``val_freq`` steps — under ``cache_backbone_feats`` that
    forward is precomputed once and each val epoch is head+probes only.

    Padded entries (short final batch) arrive as ``ind = -1``: their labels
    are forced to the ignore value so the confusion matrices never count a
    duplicated image.
    """
    nc = seg.n_classes
    extra = seg.cfg.extra_clusters

    cfg = seg.cfg

    def val_step(cache: Dict[str, Any], params: Params,
                 batch: Dict[str, Any]):
        from stego_tpu.ops.probe_ce import upsampled_argmax

        ind = batch["ind"]
        if cfg.feat_cache_sharded:
            from stego_tpu.parallel.mesh import sharded_row_take

            def take(a, i):
                return sharded_row_take(a, i, seg.mesh)
        else:
            def take(a, i):
                return jnp.take(a, jnp.maximum(i, 0), axis=0)
        image_feat = jax.tree.map(lambda a: take(a, ind), cache["feats"])
        label = take(cache["label"], ind).astype(jnp.int32)
        label = jnp.where((ind >= 0)[:, None, None], label, -1)
        code = seg.net.head_code(params["head"], image_feat, train=False)

        hw = label.shape[1:3]
        linear_preds = upsampled_argmax(
            linear_probe_logits(params["linear_probe"], code), hw)
        clu_ips = code @ l2_normalize(params["cluster_probe"]["clusters"],
                                      axis=1).T
        cluster_preds = upsampled_argmax(clu_ips, hw)

        conf_linear = update_conf_matrix(
            jnp.zeros((nc, nc), jnp.int32), linear_preds, label, nc, 0
        )
        conf_cluster = update_conf_matrix(
            jnp.zeros((nc + extra, nc), jnp.int32), cluster_preds, label, nc,
            extra,
        )
        return {
            "conf_linear": conf_linear,
            "conf_cluster": conf_cluster,
            "linear_preds": linear_preds,
            "cluster_preds": cluster_preds,
        }

    return val_step


def make_cached_val_epoch(seg: UnsupervisedSegmenter):
    """A WHOLE cached validation epoch in one dispatch.

    ``lax.scan`` of :func:`make_cached_val_step` over (n_batches, B) index
    stacks, accumulating the confusion matrices on device — the epoch's only
    outputs are two tiny int32 matrices, so there is no reason to pay
    per-batch dispatch latency (~2 ms on tunneled hosts) for a val set of
    hundreds of batches. Padded rows arrive as ind = -1 and contribute
    nothing (same contract as the single step).
    """
    single = make_cached_val_step(seg)
    nc = seg.n_classes
    extra = seg.cfg.extra_clusters

    def val_epoch(cache: Dict[str, Any], params: Params, inds: jnp.ndarray):
        def body(carry, ind):
            out = single(cache, params, {"ind": ind})
            return (carry[0] + out["conf_linear"],
                    carry[1] + out["conf_cluster"]), None

        init = (jnp.zeros((nc, nc), jnp.int32),
                jnp.zeros((nc + extra, nc), jnp.int32))
        (cl, cc), _ = jax.lax.scan(body, init, inds)
        return {"conf_linear": cl, "conf_cluster": cc}

    return val_epoch


def make_val_step(seg: UnsupervisedSegmenter):
    """Validation step (reference validation_step,
    train_segmentation.py:254-269): code upsampled to label resolution, probe
    argmax predictions, device-side confusion matrices."""
    nc = seg.n_classes
    extra = seg.cfg.extra_clusters

    def val_step(backbone: Params, params: Params, batch: Dict[str, Any]):
        from stego_tpu.data.loader import restore_dtypes
        from stego_tpu.ops.probe_ce import upsampled_argmax

        batch = restore_dtypes(batch)
        img = batch["img"]
        label = batch["label"]
        _, code = seg.net.apply(backbone, params["head"], img, train=False)

        # Predictions via code-res logits + channel-major upsampled argmax:
        # mathematically identical to the reference's interpolate-then-probe
        # order (bilinear resize commutes with the affine linear probe; the
        # cosine-cluster argmax is invariant to the per-pixel code norm that
        # upsampling would change) but ~2x faster — the 70-dim code upsample
        # at label res lane-pads to 128 and dominated the val step
        # (ops/probe_ce.py:upsampled_argmax).
        hw = label.shape[1:3]
        linear_preds = upsampled_argmax(
            linear_probe_logits(params["linear_probe"], code), hw)
        clu_ips = code @ l2_normalize(params["cluster_probe"]["clusters"],
                                      axis=1).T
        cluster_preds = upsampled_argmax(clu_ips, hw)

        conf_linear = update_conf_matrix(
            jnp.zeros((nc, nc), jnp.int32), linear_preds, label, nc, 0
        )
        conf_cluster = update_conf_matrix(
            jnp.zeros((nc + extra, nc), jnp.int32), cluster_preds, label, nc,
            extra,
        )
        return {
            "conf_linear": conf_linear,
            "conf_cluster": conf_cluster,
            "linear_preds": linear_preds,
            "cluster_preds": cluster_preds,
        }

    return val_step
