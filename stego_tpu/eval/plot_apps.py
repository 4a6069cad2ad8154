"""Entry points for the figure scripts (reference plot_dino_correspondence.py,
plot_potsdam.py, plot_pr_curves.py), assembling datasets + models around
:mod:`stego_tpu.eval.analysis`."""

from __future__ import annotations

from os.path import join

import jax
import jax.numpy as jnp
import numpy as np

from stego_tpu.config import Config, prep_args
from stego_tpu.data.contrastive import ContrastiveSegDataset
from stego_tpu.data.transforms import get_transform
from stego_tpu.eval.analysis import (
    correspondence_heatmaps,
    crf_kernel_fd,
    crf_module_apply,
    crf_pair_diffs,
    interpolated_query_path,
    label_agreement_fd,
    plot_correspondence_figure,
    plot_pr_curves,
    potsdam_mosaic,
    save_correspondence_gif,
    train_crf_recalibrator,
)


def _cfg_from_cli(argv):
    overrides = prep_args(argv)
    base = overrides.pop("config", None)
    extra = {k: overrides.pop(k) for k in list(overrides)
             if k in ("img_num", "plot_movie", "model_path_stego")}
    cfg = (Config.from_yaml(base, **overrides) if base
           else Config.from_dict(overrides, strict=True))
    return cfg, extra


def correspondence_main(argv=None):
    """Query-point correspondence figure (+ optional GIF movie)."""
    cfg, extra = _cfg_from_cli(argv)
    high_res = 512 if cfg.res >= 512 else cfg.res
    dataset = ContrastiveSegDataset(
        pytorch_data_dir=cfg.pytorch_data_dir,
        dataset_name=cfg.dataset_name,
        crop_type=None,
        image_set="train",
        transform=get_transform(high_res, False, "center"),
        target_transform=get_transform(high_res, True, "center"),
        cfg=cfg, num_neighbors=2, mask=True, pos_images=True, pos_labels=True,
    )
    from stego_tpu.models.featurizer import DinoFeaturizer
    from stego_tpu.models.vit import VIT_CONFIGS
    from stego_tpu.train.app import build_backbone

    vit_cfg = VIT_CONFIGS[cfg.model_type][cfg.dino_patch_size]
    net = DinoFeaturizer(vit_cfg, cfg.dim, cfg.dino_feat_type,
                         cfg.projection_type, use_dropout=False)
    backbone = build_backbone(cfg, vit_cfg, jax.random.PRNGKey(0))
    head = net.init_head(jax.random.PRNGKey(1))

    img_num = int(extra.get("img_num", 6)) % len(dataset)
    item = dataset[img_num]
    img = jnp.asarray(item["img"])[None]
    img_pos = jnp.asarray(item["img_pos"])[None]

    feats1, _ = net.apply(backbone, head, img)
    feats2, _ = net.apply(backbone, head, img_pos)

    # reference's three query points (plot_dino_correspondence.py:119-125)
    query_points = jnp.asarray(
        [[-0.1, 0.0], [0.5, 0.8], [-0.7, -0.7]], jnp.float32
    ).reshape(1, 3, 1, 2)
    hi, he = correspondence_heatmaps(feats1, feats2, query_points,
                                     (high_res, high_res))
    result_dir = join(cfg.output_root, "results", "correspondence")
    plot_correspondence_figure(
        join(result_dir, "correspondence.png"),
        np.asarray(img[0]), np.asarray(img_pos[0]),
        np.asarray(hi), np.asarray(he), np.asarray(query_points),
    )
    print("wrote", join(result_dir, "correspondence.png"))

    if extra.get("plot_movie"):
        path_pts = interpolated_query_path(
            [[-0.7, -0.7], [-0.1, 0.0], [0.5, 0.8]])
        hi, he = correspondence_heatmaps(feats1, feats2,
                                         jnp.asarray(path_pts),
                                         (high_res, high_res))
        save_correspondence_gif(
            join(result_dir, "attention_interp.gif"),
            np.asarray(img[0]), np.asarray(img_pos[0]),
            np.asarray(hi), np.asarray(he), path_pts,
        )
        print("wrote", join(result_dir, "attention_interp.gif"))


def potsdam_main(argv=None):
    cfg, extra = _cfg_from_cli(argv)
    model_path = cfg.model_path or "./saved_models/potsdam_test.ckpt"
    potsdam_mosaic(cfg, model_path, img_num=int(extra.get("img_num", 6)))
    print("wrote results/predictions/potsdam/")


def pr_curves_main(argv=None):
    """Label-agreement PR curves: STEGO code vs raw DINO feats vs the analytic
    CRF kernel (MoCo row requires a converted ResNet checkpoint via
    pretrained_weights; reference plot_pr_curves.py:160-218)."""
    cfg, extra = _cfg_from_cli(argv)
    dataset = ContrastiveSegDataset(
        pytorch_data_dir=cfg.pytorch_data_dir,
        dataset_name=cfg.dataset_name,
        crop_type=None,
        image_set="val",
        transform=get_transform(320, False, "center"),
        target_transform=get_transform(320, True, "center"),
        cfg=cfg, mask=True,
    )
    from stego_tpu.eval.evaluate import load_model_for_eval

    model_path = extra.get("model_path_stego") or cfg.model_path
    seg, backbone, params = load_model_for_eval(model_path)

    key = jax.random.PRNGKey(0)
    n_batches = min(8, len(dataset) // max(cfg.batch_size, 1))
    outs = {"stego_fd": [], "dino_fd": [], "crf_fd": [], "ld": [],
            "coord_diff": [], "img_diff": []}
    for b in range(max(n_batches, 1)):
        items = [dataset[i] for i in range(b * cfg.batch_size,
                                           min((b + 1) * cfg.batch_size,
                                               len(dataset)))]
        img = jnp.asarray(np.stack([it["img"] for it in items]))
        label = jnp.asarray(np.stack([it["label"] for it in items]))
        feats, code = seg.net.apply(backbone, params["head"], img)
        s = cfg.feature_samples
        k1, k2 = jax.random.split(jax.random.fold_in(key, b))
        coords1 = jax.random.uniform(k1, (img.shape[0], s, s, 2),
                                     minval=-1, maxval=1)
        coords2 = jax.random.uniform(k2, (img.shape[0], s, s, 2),
                                     minval=-1, maxval=1)
        ld, stego_fd = label_agreement_fd(code, label, seg.n_classes,
                                          coords1, coords2)
        _, dino_fd = label_agreement_fd(feats, label, seg.n_classes,
                                        coords1, coords2)
        crf = crf_kernel_fd(img, coords1, coords2)
        coord_diff, img_diff = crf_pair_diffs(img, coords1, coords2)
        outs["stego_fd"].append(np.asarray(stego_fd).ravel())
        outs["dino_fd"].append(np.asarray(dino_fd).ravel())
        outs["crf_fd"].append(np.asarray(crf).ravel())
        outs["ld"].append(np.asarray(ld).ravel())
        outs["coord_diff"].append(np.asarray(coord_diff).ravel())
        outs["img_diff"].append(np.asarray(img_diff).ravel())

    cat = {k: np.concatenate(v) for k, v in outs.items()}
    # learned CRF recalibrator: train the 6 kernel scalars against label
    # agreement (reference LitRecalibrator/CRFModule, plot_pr_curves.py:53-67)
    crf_params = train_crf_recalibrator(
        jnp.asarray(cat["coord_diff"]), jnp.asarray(cat["img_diff"]),
        jnp.asarray(cat["ld"]))
    crf_learned = np.asarray(crf_module_apply(
        crf_params, jnp.asarray(cat["coord_diff"]),
        jnp.asarray(cat["img_diff"])))
    path = join(cfg.output_root, "results", "pr_curves.png")
    aps = plot_pr_curves(
        path,
        {"STEGO (Ours)": cat["stego_fd"], "DINO": cat["dino_fd"],
         "CRF": cat["crf_fd"], "CRF (learned)": crf_learned},
        cat["ld"],
    )
    print("wrote", path, aps)
