"""precompute_knns entry point.

Behavioral reference: src/precompute_knns.py — for each (crop_type x split x
dataset), embed every image with the frozen backbone at res 224, build the
top-30 cosine neighbor table, save the compressed ``.npz`` cache. Skips caches
that already exist.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax

from stego_tpu.config import Config
from stego_tpu.data.contrastive import ContrastiveSegDataset, knn_cache_file
from stego_tpu.data.loader import DataLoader, effective_threads
from stego_tpu.data.transforms import get_transform
from stego_tpu.models.featurizer import DinoFeaturizer
from stego_tpu.models.vit import ViTConfig
from stego_tpu.parallel.mesh import make_mesh
from stego_tpu.train.app import build_backbone

KNN_RES = 224  # reference precompute_knns.py:47
EMBED_BATCH = 256  # reference loader batch (:82)


def precompute_knns(
    cfg: Config,
    dataset_names: Optional[Sequence[str]] = None,
    image_sets: Sequence[str] = ("val", "train"),
    crop_types: Sequence = ("five", None),
    vit_cfg: Optional[ViTConfig] = None,
    res: int = KNN_RES,
    batch_size: int = EMBED_BATCH,
) -> List[str]:
    """Returns the list of cache files written."""
    if dataset_names is None:
        dataset_names = [cfg.dataset_name]

    seg_net = None
    backbone = None
    mesh = make_mesh(cfg.num_devices)
    written = []
    for crop_type in crop_types:
        for image_set in image_sets:
            for dataset_name in dataset_names:
                from stego_tpu.data.contrastive import dataset_nice_name

                nice = dataset_nice_name(cfg, dataset_name)
                cache = knn_cache_file(cfg.pytorch_data_dir, cfg.model_type,
                                       nice, image_set, crop_type, res)
                if os.path.exists(cache):
                    continue
                print(f"{cache} not found, computing")
                dataset = ContrastiveSegDataset(
                    pytorch_data_dir=cfg.pytorch_data_dir,
                    dataset_name=dataset_name,
                    crop_type=crop_type,
                    image_set=image_set,
                    transform=get_transform(res, False, "center"),
                    target_transform=get_transform(res, True, "center"),
                    cfg=cfg.replace(res=res),
                    seed=cfg.seed,
                )
                if seg_net is None:
                    import jax.numpy as jnp

                    bdtype = (jnp.bfloat16 if cfg.backbone_dtype == "bfloat16"
                              else jnp.float32)
                    if cfg.arch == "dino":
                        from stego_tpu.models.vit import VIT_CONFIGS

                        vcfg = vit_cfg or VIT_CONFIGS[cfg.model_type][
                            cfg.dino_patch_size]
                        if cfg.potsdam_ir and vcfg.in_chans != 4:
                            import dataclasses

                            vcfg = dataclasses.replace(vcfg, in_chans=4)
                        seg_net = DinoFeaturizer(
                            vcfg, dim=20, feat_type=cfg.dino_feat_type,
                            projection_type=None, use_dropout=False,
                            backbone_dtype=bdtype, mesh=mesh,
                        )
                        backbone = build_backbone(cfg, vcfg,
                                                  jax.random.PRNGKey(0))
                    else:
                        # non-dino archs embed with the cut backbone
                        # (reference precompute_knns.py:56-58)
                        from stego_tpu.models.zoo import CutBackboneEmbedder

                        seg_net = CutBackboneEmbedder(cfg.model_type,
                                                      backbone_dtype=bdtype)
                        backbone = seg_net.load_or_init(
                            cfg.pretrained_weights, jax.random.PRNGKey(0))
                bs = min(batch_size, len(dataset))
                d = mesh.devices.size
                bs = max(d, (bs // d) * d)
                loader = DataLoader(
                    dataset, bs, shuffle=False, drop_last=False,
                    num_threads=effective_threads(cfg.num_workers))

                # pad the final short batch inside embed by chunking on host
                def padded_loader():
                    for batch in loader:
                        img = batch["img"]
                        if img.shape[0] % d != 0:
                            import numpy as np

                            pad = d - img.shape[0] % d
                            img = np.concatenate(
                                [img, np.repeat(img[-1:], pad, axis=0)], axis=0)
                            yield {"img": img, "_pad": pad}
                        else:
                            yield {"img": img, "_pad": 0}

                from stego_tpu.train.knn import make_embed_fn, topk_neighbors
                import numpy as np

                embed_fn = make_embed_fn(seg_net, backbone, mesh)
                chunks = []
                for batch in padded_loader():
                    e = np.asarray(embed_fn(batch["img"]))
                    if batch["_pad"]:
                        e = e[:-batch["_pad"]]
                    chunks.append(e)
                feats = np.concatenate(chunks, axis=0)
                assert feats.shape[0] == len(dataset)
                nns = topk_neighbors(feats, k=min(cfg.knn_k, len(dataset)),
                                     mesh=mesh)
                os.makedirs(os.path.dirname(cache), exist_ok=True)
                np.savez_compressed(cache, nns=nns)
                written.append(cache)
                print("Saved NNs", cfg.model_type, nice, image_set)
    return written


def main(argv=None):
    from stego_tpu.config import prep_args

    overrides = prep_args(argv)
    base = overrides.pop("config", None)
    cfg = (Config.from_yaml(base, **overrides) if base
           else Config.from_dict(overrides, strict=True))
    if cfg.dataset_name == "directory":
        precompute_knns(cfg, crop_types=[None])
    else:
        precompute_knns(cfg)


if __name__ == "__main__":
    main()
