"""Device-resident frozen-backbone feature cache (beyond-reference).

STEGO's backbone is frozen (reference no-grad region, src/modules.py:85) and
its loader transform is deterministic per index outside of
``loader_crop_type="random"`` — yet the reference recomputes the identical
DINO features for every image on every epoch, and those three no-grad ViT
forwards are ~95% of the measured train step. ``cache_backbone_feats=true``
runs the backbone ONCE over the train split, keeps ``(feats, label[, mask])``
resident in HBM, and trains head + probes from int32 index batches: the
host->device wire carries ~8 bytes per image per step and the step itself is
head/loss/optimizer work only.

This is the same philosophy as the reference's own five-crop materializer
(src/crop_datasets.py) moved one level up the stack, and the TPU-idiomatic
counterpart of its MaterializedDataset dead code (src/data.py:403-416):
device-resident data, zero host round-trips, static shapes.

Semantics are EXACTLY the standard step's (shared ``_update_from_feats``;
tests/test_feat_cache.py proves step-for-step equivalence); the mode refuses
configurations whose losses need per-step images (aug alignment, CRF loss)
or nondeterministic decoding (random loader crops).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from stego_tpu.config import Config
from stego_tpu.parallel.mesh import batch_sharding, replicated_sharding


def validate_feat_cache_cfg(cfg: Config) -> None:
    """Reject configurations the cache cannot represent faithfully."""
    if cfg.arch != "dino":
        raise ValueError(
            "cache_backbone_feats supports arch=dino (the FPN arm's BatchNorm "
            "head consumes multi-scale taps whose running stats the cache "
            "would freeze)")
    if cfg.loader_crop_type == "random":
        raise ValueError(
            "cache_backbone_feats requires a deterministic loader transform: "
            "loader_crop_type='random' decodes a different crop every epoch "
            "(use crop_type=five materialized crops instead — the reference's "
            "own crop_datasets.py pattern)")
    if cfg.aug_alignment_weight > 0:
        raise ValueError(
            "cache_backbone_feats is incompatible with aug_alignment_weight>0:"
            " the augmented view must pass through the backbone every step")
    if cfg.crf_weight > 0:
        raise ValueError(
            "cache_backbone_feats is incompatible with crf_weight>0: the CRF "
            "loss consumes per-step images")


def estimate_cache_gb(cfg: Config, seg, n_items: int,
                      res: int | None = None, with_mask: bool | None = None
                      ) -> float:
    """Upfront HBM estimate (feats + labels [+ masks]), in GiB."""
    res = res or cfg.res
    hp = res // seg.vit_cfg.patch_size
    feat_itemsize = 2 if cfg.backbone_dtype == "bfloat16" else 4
    per_item = hp * hp * seg.net.n_feats * feat_itemsize
    per_item += res * res * 2  # int16 labels
    if cfg.use_salience if with_mask is None else with_mask:
        per_item += res * res * 2  # float16 masks
    return n_items * per_item / 2**30


def build_feat_cache(seg, backbone: Dict, contrastive_ds, cfg: Config,
                     mesh, batch_size: int | None = None,
                     res: int | None = None,
                     with_mask: bool | None = None) -> Dict[str, Any]:
    """One backbone pass over the (deterministic) base dataset.

    Returns a dict of device arrays indexed by base-dataset index:
    ``feats`` (N, H/p, W/p, C) in the trunk dtype, ``label`` (N, res, res)
    int16, and ``mask`` (N, res, res) float16 when ``use_salience``.
    Replicated by default (``jnp.take`` with batch-sharded indices needs no
    collectives); with ``feat_cache_sharded=true`` rows are block-distributed
    over the data axis (capacity × mesh size) and the steps gather via
    :func:`stego_tpu.parallel.mesh.sharded_row_take`.

    ``res``/``with_mask`` override the train-split defaults — the validation
    cache is built at ``cfg.val_res`` and never needs salience masks.
    """
    validate_feat_cache_cfg(cfg)
    base = contrastive_ds.dataset
    n = len(base)
    want_mask = cfg.use_salience if with_mask is None else with_mask
    d = mesh.devices.size
    est = estimate_cache_gb(cfg, seg, n, res=res, with_mask=want_mask)
    per_device = est / d if cfg.feat_cache_sharded else est
    if per_device > cfg.feat_cache_max_gb:
        hint = ("raise the cap if HBM allows, or train without "
                "cache_backbone_feats")
        if not cfg.feat_cache_sharded and d > 1:
            hint = ("set feat_cache_sharded=true to row-shard it over the "
                    f"{d}-device mesh (~{est / d:.1f} GiB/device), " + hint)
        raise ValueError(
            f"feature cache for {n} items would need ~{per_device:.1f} GiB "
            f"per device (> feat_cache_max_gb={cfg.feat_cache_max_gb}); "
            + hint)

    b = batch_size or max(cfg.batch_size, d)
    b = -(-b // d) * d  # divisible by the mesh for batch-sharded puts
    bs, rs = batch_sharding(mesh), replicated_sharding(mesh)
    if cfg.feat_cache_sharded:
        rs = bs  # rows block-distributed over the data axis
    fwd = jax.jit(seg.net.backbone_features)

    feat_parts, labels, masks = [], [], []
    for start in range(0, n, b):
        idxs = range(start, min(start + b, n))
        items = [base[i] for i in idxs]
        imgs = np.stack([it[0] for it in items])
        labels.append(np.stack([it[1] for it in items]).astype(np.int16))
        if want_mask:
            masks.append(np.stack([it[2] for it in items]).astype(np.float16))
        pad = b - len(items)
        if pad:  # keep ONE compiled shape for the final short chunk
            imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, axis=0)])
        f = fwd(backbone, jax.device_put(jnp.asarray(imgs), bs))
        if pad:
            f = f[:len(items)]
        feat_parts.append(f)

    def put(a):
        if cfg.feat_cache_sharded and a.shape[0] % d:
            # block distribution needs N % d == 0; sampler indices never
            # reference the zero-padded tail rows
            pad = d - a.shape[0] % d
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        return jax.device_put(a, rs)

    cache = {
        "feats": put(jnp.concatenate(feat_parts, axis=0)),
        "label": put(jnp.asarray(np.concatenate(labels))),
    }
    if want_mask:
        cache["mask"] = put(jnp.asarray(np.concatenate(masks)))
    return cache


class FeatCacheSampler:
    """Index-only mirror of ``ContrastiveSegDataset.__getitem__``'s pair draw.

    Reproduces the neighbor selection exactly — same ``(seed, epoch, ind)``
    Generator, same first draw (data/contrastive.py:163-169; reference
    data.py:524) — without decoding any image, so the cached mode samples the
    very (ind, ind_pos) sequence the image pipeline would have fed the step.
    ``DataLoader`` drives ``epoch`` like any dataset's.
    """

    def __init__(self, contrastive_ds):
        self.ds = contrastive_ds
        self.epoch = 0
        self.use_pos = contrastive_ds.pos_images or contrastive_ds.pos_labels

    def __len__(self) -> int:
        return len(self.ds)

    def __getitem__(self, ind: int) -> Dict[str, np.ndarray]:
        out = {"ind": np.int32(ind)}
        if self.use_pos:
            rng = np.random.default_rng((self.ds.seed, self.epoch, ind))
            nn_choice = int(rng.integers(1, self.ds.num_neighbors + 1))
            out["ind_pos"] = np.int32(self.ds.nns[ind][nn_choice])
        return out
