"""Analysis & figure generation: correspondence heatmaps, Potsdam mosaics,
precision-recall curves.

Behavioral references: src/plot_dino_correspondence.py, src/plot_potsdam.py,
src/plot_pr_curves.py. The full-field query-vs-map correlation reuses the same
einsum math as the loss (sampled query features against the whole feature
map, per-query mean-centering, clamp at 0, bilinear upsample with
align_corners=True — plot_dino_correspondence.py:45-56).
"""

from __future__ import annotations

import os
from os.path import join
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stego_tpu.ops.interp import interpolate
from stego_tpu.ops.math import l2_normalize, tensor_correlation
from stego_tpu.ops.sampling import sample_from_coords

# ----------------------------------------------------------------------
# correspondence heatmaps


def correspondence_heatmaps(
    feats1: jnp.ndarray,
    feats2: jnp.ndarray,
    query_points: jnp.ndarray,
    out_hw: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Query-point correspondence fields.

    Args:
      feats1/feats2: (1, h, w, C) feature maps of the image and its KNN pair.
      query_points: (1, P, 1, 2) normalized coords (reference layout).
      out_hw: upsample target (the input image size).
    Returns:
      (heatmap_intra, heatmap_inter): (P, H, W) arrays, mean-centered and
      clamped at 0 (plot_dino_correspondence.py:45-56).
    """
    sfeats = sample_from_coords(feats1, query_points)  # (1, 1, P, C)

    def field(feats):
        attn = tensor_correlation(l2_normalize(sfeats), l2_normalize(feats))
        attn = attn - jnp.mean(attn, axis=(3, 4), keepdims=True)
        attn = jnp.maximum(attn, 0.0)[0]  # (1, P, i, j) -> squeeze batch
        # (h1=1, P, i, j) -> (P, i, j); upsample bilinear align_corners=True
        attn = attn.reshape(attn.shape[-3], *attn.shape[-2:])
        up = interpolate(attn[..., None], out_hw, "bilinear",
                         align_corners=True)[..., 0]
        return up

    return field(feats1), field(feats2)


def plot_correspondence_figure(
    path: str,
    img: np.ndarray,
    img_pos: np.ndarray,
    heatmap_intra: np.ndarray,
    heatmap_inter: np.ndarray,
    query_points: np.ndarray,
    dark_mode: bool = True,
) -> None:
    """Three-panel figure: query points / self correspondence / KNN
    correspondence (plot_dino_correspondence.py:118-152)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import ListedColormap

    from stego_tpu.utils.viz import prep_for_plot

    if dark_mode:
        plt.style.use("dark_background")
    colors = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0)]
    cmaps = [
        ListedColormap([(r, g, b, i / 255) for i in range(255)])
        for (r, g, b) in colors
    ]
    high_res = img.shape[0]
    fig, axes = plt.subplots(1, 3, figsize=(15, 5), dpi=100)
    for ax, title in zip(axes, ("Image and Query Points", "Self Correspondence",
                                "KNN Correspondence")):
        ax.set_title(title, fontsize=20)
        ax.set_xticks([])
        ax.set_yticks([])

    axes[0].imshow(prep_for_plot(img))
    axes[1].imshow(prep_for_plot(img) * 0.8)
    axes[2].imshow(prep_for_plot(img_pos) * 0.8)
    n_points = heatmap_intra.shape[0]
    for p in range(n_points):
        # reference plots (x=coord0, y=coord1) (plot_dino_correspondence.py:131-136)
        point = (query_points[0, p, 0] + 1) / 2 * high_res
        axes[0].scatter(point[0], point[1], c=[colors[p % 4]], marker="x",
                        s=500, linewidths=5)
        # symmetric color range like reference plot_heatmap
        # (plot_dino_correspondence.py:19-33)
        vmax_intra = np.abs(heatmap_intra[p]).max() or 1.0
        vmax_inter = np.abs(heatmap_inter[p]).max() or 1.0
        axes[1].imshow(heatmap_intra[p], alpha=0.5, cmap=cmaps[p % 4],
                       vmin=-vmax_intra, vmax=vmax_intra)
        axes[2].imshow(heatmap_inter[p], alpha=0.5, cmap=cmaps[p % 4],
                       vmin=-vmax_inter, vmax=vmax_inter)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def save_correspondence_gif(
    path: str,
    img: np.ndarray,
    img_pos: np.ndarray,
    heatmaps_intra: np.ndarray,
    heatmaps_inter: np.ndarray,
    query_points: np.ndarray,
    fps: int = 15,
) -> None:
    """Query-point interpolation movie (reference renders an mp4 via ffmpeg,
    plot_dino_correspondence.py:210-214; we render a GIF via PIL to stay
    dependency-free)."""
    from PIL import Image

    from stego_tpu.utils.viz import prep_for_plot

    base1 = (prep_for_plot(img) * 255).astype(np.uint8)
    base2 = (prep_for_plot(img_pos) * 255).astype(np.uint8)
    frames = []
    h = img.shape[0]
    for p in range(heatmaps_intra.shape[0]):
        def overlay(base, hm):
            hm = hm / (hm.max() + 1e-9)
            out = base.astype(np.float32)
            out[..., 0] = out[..., 0] * (1 - 0.7 * hm) + 255 * 0.7 * hm
            return out.astype(np.uint8)

        left = base1.copy()
        pt = ((query_points[0, p, 0] + 1) / 2 * h).astype(int)
        y0, x0 = np.clip(pt[1], 2, h - 3), np.clip(pt[0], 2, h - 3)
        left[y0 - 2:y0 + 3, x0 - 2:x0 + 3] = [255, 0, 0]
        frame = np.concatenate(
            [left, overlay(base1, heatmaps_intra[p]),
             overlay(base2, heatmaps_inter[p])], axis=1)
        frames.append(Image.fromarray(frame))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)


def interpolated_query_path(key_points: Sequence[Sequence[float]],
                            hold: int = 10, steps: int = 10) -> np.ndarray:
    """Hold-then-interpolate query trajectory
    (plot_dino_correspondence.py:156-170)."""
    all_points: List[List[float]] = []
    for i in range(len(key_points)):
        all_points.extend([list(key_points[i])] * hold)
        if i < len(key_points) - 1:
            seg = np.stack([
                np.linspace(key_points[i][0], key_points[i + 1][0], steps),
                np.linspace(key_points[i][1], key_points[i + 1][1], steps),
            ], axis=1)
            all_points.extend(seg.tolist())
    return np.asarray(all_points, np.float32).reshape(1, len(all_points), 1, 2)


# ----------------------------------------------------------------------
# Potsdam mosaics


def potsdam_mosaic(
    eval_cfg,
    model_path: str,
    img_num: int = 6,
    tile_res: int = 320,
    vit_cfg=None,
    dataset=None,
    grid: int = 15,
) -> Dict[str, np.ndarray]:
    """Stitch one PotsdamRaw scene (grid x grid tiles), run flip-TTA cluster
    predictions, Hungarian-map them (reference plot_potsdam.py:42-91).

    Returns dict with 'img', 'label', 'cluster' full-scene arrays and also
    saves PNGs under results/predictions/potsdam.
    """
    from PIL import Image

    from stego_tpu.data.contrastive import ContrastiveSegDataset
    from stego_tpu.data.transforms import get_transform
    from stego_tpu.eval.evaluate import load_model_for_eval
    from stego_tpu.models.probes import cluster_lookup
    from stego_tpu.utils.metrics import UnsupervisedMetrics
    from stego_tpu.utils.viz import prep_for_plot

    seg, backbone, params = load_model_for_eval(model_path, vit_cfg=vit_cfg)
    if dataset is None:
        dataset = ContrastiveSegDataset(
            pytorch_data_dir=eval_cfg.pytorch_data_dir,
            dataset_name="potsdamraw", crop_type=None, image_set="all",
            transform=get_transform(tile_res, False, "center"),
            target_transform=get_transform(tile_res, True, "center"),
            cfg=seg.cfg,
        )

    @jax.jit
    def predict(img):
        # two backbone calls in one jitted program — measured faster than a
        # concat-batched call (see evaluate.py:make_eval_step)
        _, code1 = seg.net.apply(backbone, params["head"], img, train=False)
        _, code2 = seg.net.apply(backbone, params["head"], img[:, :, ::-1],
                                 train=False)
        code = (code1 + code2[:, :, ::-1]) / 2.0
        code = interpolate(code, (tile_res, tile_res), "bilinear",
                           align_corners=False)
        lp = cluster_lookup(params["cluster_probe"], code, alpha=2.0,
                            log_probs=True)
        return jnp.argmax(lp, axis=-1)

    metrics = UnsupervisedMetrics("final/cluster/", seg.n_classes,
                                  seg.cfg.extra_clusters, True)
    tiles = grid * grid
    start = tiles * img_num
    imgs, labels, preds = [], [], []
    bs = 16
    for i in range(start, start + tiles, bs):
        batch = [dataset[j] for j in range(i, min(i + bs, start + tiles))]
        img = jnp.asarray(np.stack([b["img"] for b in batch]))
        label = np.stack([b["label"] for b in batch])
        pred = np.asarray(predict(img))
        metrics.update(pred, label)
        imgs.append(np.asarray(img))
        labels.append(label)
        preds.append(pred)
    metrics.compute()

    def stitch(parts, channels_last=True):
        arr = np.concatenate(parts, axis=0)  # (225, H, W[, C])
        arr = arr.reshape(grid, grid, *arr.shape[1:])
        arr = np.swapaxes(arr, 1, 2)  # (gy, H, gx, W, ...)
        return arr.reshape(grid * tile_res, grid * tile_res,
                           *arr.shape[4:])

    full_img = stitch(imgs)
    full_label = stitch(labels)
    full_pred = metrics.map_clusters(stitch(preds))

    result_dir = join("results", "predictions", "potsdam")
    for sub in ("img", "label", "cluster"):
        os.makedirs(join(result_dir, sub), exist_ok=True)
    from stego_tpu.data.colormaps import colormap_for_dataset

    cmap = colormap_for_dataset("potsdam")
    Image.fromarray((prep_for_plot(full_img) * 255).astype(np.uint8)).save(
        join(result_dir, "img", f"{img_num}.png"))
    Image.fromarray(cmap[np.clip(full_label, 0, len(cmap) - 1)]
                    .astype(np.uint8)).save(
        join(result_dir, "label", f"{img_num}.png"))
    Image.fromarray(cmap[np.clip(full_pred, 0, len(cmap) - 1)]
                    .astype(np.uint8)).save(
        join(result_dir, "cluster", f"{img_num}.png"))
    return {"img": full_img, "label": full_label, "cluster": full_pred}


# ----------------------------------------------------------------------
# precision-recall curves


def crf_pair_diffs(img: jnp.ndarray, coords1: jnp.ndarray,
                   coords2: jnp.ndarray):
    """(coord_diff, img_diff): squared coordinate / RGB distances between all
    sampled coordinate pairs (reference get_crf_fd,
    plot_pr_curves.py:95-107)."""
    n = img.shape[0]
    img_s1 = sample_from_coords(img, coords1).reshape(n, -1, 1, 3)
    img_s2 = sample_from_coords(img, coords2).reshape(n, 1, -1, 3)
    coord_diff = jnp.sum(jnp.square(
        coords1.reshape(n, -1, 1, 2) - coords2.reshape(n, 1, -1, 2)), -1)
    img_diff = jnp.sum(jnp.square(img_s1 - img_s2), -1)
    return coord_diff, img_diff


def init_crf_module() -> dict:
    """Learnable CRF-kernel parameters at the reference's init values
    (reference CRFModule.__init__, plot_pr_curves.py:53-61)."""
    return {k: jnp.asarray(v, jnp.float32) for k, v in
            dict(w1=10.0, w2=3.0, shift=-0.3,
                 alpha=0.5, beta=0.15, gamma=0.05).items()}


def crf_module_apply(params: dict, coord_diff: jnp.ndarray,
                     img_diff: jnp.ndarray) -> jnp.ndarray:
    """|w1|·exp(-d_xy/2e^α - d_rgb/2e^β) + |w2|·exp(-d_xy/2e^γ) - shift
    (reference CRFModule.forward, plot_pr_curves.py:63-67)."""
    return (jnp.abs(params["w1"])
            * jnp.exp(-coord_diff / (2 * jnp.exp(params["alpha"]))
                      - img_diff / (2 * jnp.exp(params["beta"])))
            + jnp.abs(params["w2"])
            * jnp.exp(-coord_diff / (2 * jnp.exp(params["gamma"])))
            - params["shift"])


def train_crf_recalibrator(coord_diff: jnp.ndarray, img_diff: jnp.ndarray,
                           ld: jnp.ndarray, steps: int = 300,
                           lr: float = 5e-2) -> dict:
    """Train the 6 CRF-kernel scalars with BCE against label agreement.

    The reference ships the apparatus for this (CRFModule inside
    LitRecalibrator, plot_pr_curves.py:53-67,124-150) but its training_step is
    vestigial (returns None); here the module actually trains: logits = kernel
    output, targets = (label agreement > 0.5), optax Adam."""
    import optax

    params = init_crf_module()
    targets = (ld.reshape(-1) > 0.5).astype(jnp.float32)
    cd = coord_diff.reshape(-1)
    idiff = img_diff.reshape(-1)
    opt = optax.adam(lr)

    def loss_fn(p):
        fd = crf_module_apply(p, cd, idiff)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(fd, targets))

    @jax.jit
    def run(params):
        state = opt.init(params)

        def body(_, carry):
            p, s = carry
            g = jax.grad(loss_fn)(p)
            up, s = opt.update(g, s, p)
            return optax.apply_updates(p, up), s

        p, _ = jax.lax.fori_loop(0, steps, body, (params, state))
        return p

    return run(params)


def crf_kernel_fd(img: jnp.ndarray, coords1: jnp.ndarray, coords2: jnp.ndarray,
                  alpha=0.5, beta=0.15, gamma=0.05, w1=10.0, w2=3.0,
                  shift=-0.3) -> jnp.ndarray:
    """Analytic CRF-kernel feature distance over sampled coordinate pairs
    (reference CRFModule + get_crf_fd, plot_pr_curves.py:53-67,95-107)."""
    coord_diff, img_diff = crf_pair_diffs(img, coords1, coords2)
    return (w1 * jnp.exp(-coord_diff / (2 * np.exp(alpha))
                         - img_diff / (2 * np.exp(beta)))
            + w2 * jnp.exp(-coord_diff / (2 * np.exp(gamma))) - shift)


def label_agreement_fd(feats: jnp.ndarray, label: jnp.ndarray, n_classes: int,
                       coords1: jnp.ndarray, coords2: jnp.ndarray):
    """(ld, fd): label-agreement targets and feature-similarity predictions at
    sampled coordinate pairs (reference get_net_fd, plot_pr_curves.py:109-122)."""
    f1 = sample_from_coords(feats, coords1)
    f2 = sample_from_coords(feats, coords2)
    one_hot = jax.nn.one_hot(label + 1, n_classes + 1, dtype=jnp.float32)
    l1 = sample_from_coords(one_hot, coords1)
    l2 = sample_from_coords(one_hot, coords2)
    fd = tensor_correlation(l2_normalize(f1), l2_normalize(f2))
    ld = tensor_correlation(l1, l2)
    return ld, fd


def pr_curve_data(preds: np.ndarray, targets: np.ndarray):
    """Min-max-normalized PR curve + average precision
    (reference plot_pr, plot_pr_curves.py:160-167)."""
    from sklearn.metrics import average_precision_score, precision_recall_curve

    preds = preds.reshape(-1).astype(np.float64)
    preds = preds - preds.min()
    rng = preds.max()
    if rng > 0:
        preds = preds / rng
    targets = (targets.reshape(-1) > 0.5).astype(np.int64)
    precisions, recalls, _ = precision_recall_curve(targets, preds)
    ap = average_precision_score(targets, preds)
    return precisions, recalls, ap


def plot_pr_curves(path: str, curves: Dict[str, Tuple[np.ndarray, np.ndarray]],
                   targets: np.ndarray) -> Dict[str, float]:
    """Render PR curves for several feature spaces; returns {name: AP}."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    aps = {}
    plt.figure(figsize=(5, 4), dpi=100)
    for name, preds in curves.items():
        precisions, recalls, ap = pr_curve_data(np.asarray(preds),
                                                np.asarray(targets))
        aps[name] = float(ap)
        plt.plot(recalls, precisions, label=f"AP={int(ap * 100)}% {name}")
    plt.xlim([0, 1])
    plt.ylim([0, 1])
    plt.legend(fontsize=12)
    plt.ylabel("Precision", fontsize=16)
    plt.xlabel("Recall", fontsize=16)
    plt.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path)
    plt.close()
    return aps
