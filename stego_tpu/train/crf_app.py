"""Standalone CRF-loss experiment: optimize a per-image code table against the
ContrastiveCRFLoss plus entropy regularizers.

Behavioral reference: src/train_crf.py. The reference script is stale (it
references an undefined ``imsize`` and an outdated dataset signature,
train_crf.py:48,52-54); this port implements the working experiment: a
``CodeSpaceTable`` parameter of shape (n_images, h, w, dim), Adam(1e-2), CRF
loss over rgb or lab guidance, global/local entropy regularization for the
discrete case, periodic PCA / boundary visualizations.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stego_tpu.config import Config
from stego_tpu.ops.crf_loss import CRFLossCfg, contrastive_crf_loss
from stego_tpu.ops.math import l2_normalize


def rgb_to_normed_lab(img01: jnp.ndarray) -> jnp.ndarray:
    """sRGB [0,1] -> CIELAB normalized by (100, 256, 256)
    (reference to_normed_lab, train_crf.py:103-106 via kornia)."""
    rgb = jnp.clip(img01, 0.0, 1.0)
    linear = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4,
                       rgb / 12.92)
    m = jnp.asarray([
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ], jnp.float32)
    xyz = linear @ m.T
    white = jnp.asarray([0.950456, 1.0, 1.088754], jnp.float32)
    xyz = xyz / white
    f = jnp.where(xyz > 0.008856, jnp.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
    l = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    lab = jnp.stack([l, a, b], axis=-1)
    return lab / jnp.asarray([100.0, 256.0, 256.0], jnp.float32)


def entropy(p: jnp.ndarray) -> jnp.ndarray:
    p = jnp.maximum(p, 1e-7)
    return -jnp.sum(p * jnp.log(p), axis=-1)


def train_crf_codes(
    cfg: Config,
    imgs: np.ndarray,
    epochs: int = 1000,
    lr: float = 1e-2,
    global_ent_weight: float = 0.1,
    local_ent_weight: float = 0.1,
    log_every: int = 100,
    out_dir: Optional[str] = None,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Optimize per-image codes; returns {'codes', 'losses'}.

    imgs: (N, H, W, 3) ImageNet-normalized images.
    """
    from stego_tpu.data.transforms import unnormalize

    n, h, w, _ = imgs.shape
    dim = cfg.dim
    continuous = cfg.continuous
    key = jax.random.PRNGKey(seed)

    code_space = 0.1 * jax.random.normal(key, (n, h, w, dim), jnp.float32)
    opt = optax.adam(lr)
    opt_state = opt.init(code_space)

    imgs_j = jnp.asarray(imgs)
    if cfg.color_space == "rgb":
        guidance = imgs_j
    elif cfg.color_space == "lab":
        guidance = rgb_to_normed_lab(jnp.asarray(unnormalize(imgs)))
    else:
        raise ValueError(f"unknown color space: {cfg.color_space}")

    crf_cfg = CRFLossCfg(n_samples=cfg.crf_samples, alpha=cfg.alpha,
                         beta=cfg.beta, gamma=cfg.gamma, w1=cfg.w1, w2=cfg.w2,
                         shift=cfg.shift)

    def prep(code):
        if continuous:
            return l2_normalize(code, axis=-1)
        return jnp.exp(jax.nn.log_softmax(code, axis=-1))

    @jax.jit
    def step(code_space, opt_state, k):
        def loss_fn(code_space):
            code = (code_space if continuous
                    else jax.nn.log_softmax(code_space, axis=-1))
            crf = jnp.mean(contrastive_crf_loss(crf_cfg, k, guidance,
                                                prep(code_space)))
            if continuous:
                reg = 0.0
            else:
                probs = jnp.exp(code)
                ent_global = jnp.mean(entropy(jnp.mean(probs, axis=0)))
                ent_local = jnp.mean(entropy(probs))
                reg = (-global_ent_weight * ent_global
                       - local_ent_weight * ent_local)
            return crf + reg, crf

        (loss, crf), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            code_space)
        updates, opt_state = opt.update(grads, opt_state, code_space)
        return optax.apply_updates(code_space, updates), opt_state, loss, crf

    losses = []
    for i in range(epochs):
        code_space, opt_state, loss, crf = step(
            code_space, opt_state, jax.random.fold_in(key, i))
        if i % log_every == 0:
            losses.append(float(loss))
            if out_dir:
                _save_code_figure(out_dir, i, np.asarray(imgs),
                                  np.asarray(code_space), continuous)
    return {"codes": np.asarray(code_space), "losses": np.asarray(losses)}


def _save_code_figure(out_dir: str, step: int, imgs: np.ndarray,
                      codes: np.ndarray, continuous: bool) -> None:
    """Image row + PCA-projected code (continuous) or argmax segment
    boundaries (discrete) — reference train_crf.py:135-155."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from stego_tpu.utils.viz import prep_for_plot

    n = imgs.shape[0]
    fig, ax = plt.subplots(2, n, figsize=(n * 3, 6), squeeze=False)
    for idx in range(n):
        ax[0, idx].imshow(prep_for_plot(imgs[idx]))
        if continuous:
            flat = codes[idx].reshape(-1, codes.shape[-1])
            flat = flat - flat.mean(0)
            # PCA via SVD to 3 components
            u, s, vt = np.linalg.svd(flat, full_matrices=False)
            proj = (flat @ vt[:3].T).reshape(*codes.shape[1:3], 3)
            proj = (proj - proj.min()) / max(proj.max() - proj.min(), 1e-9)
            ax[1, idx].imshow(proj)
        else:
            seg = codes[idx].argmax(-1)
            boundaries = np.zeros_like(seg, bool)
            boundaries[1:] |= seg[1:] != seg[:-1]
            boundaries[:, 1:] |= seg[:, 1:] != seg[:, :-1]
            img = prep_for_plot(imgs[idx]).copy()
            img[boundaries] = [1.0, 1.0, 0.0]
            ax[1, idx].imshow(img)
        ax[0, idx].axis("off")
        ax[1, idx].axis("off")
    plt.tight_layout()
    os.makedirs(out_dir, exist_ok=True)
    fig.savefig(join(out_dir, f"codes_{step}.png"))
    plt.close(fig)


def main(argv=None):
    from stego_tpu.config import prep_args
    from stego_tpu.data.contrastive import ContrastiveSegDataset
    from stego_tpu.data.transforms import get_transform

    overrides = prep_args(argv)
    base = overrides.pop("config", None)
    epochs = int(overrides.pop("epochs", 1000))
    n_images = int(overrides.pop("n_images_crf", 7))
    cfg = (Config.from_yaml(base, **overrides) if base
           else Config.from_dict(overrides, strict=True))

    small = cfg.res // 2
    dataset = ContrastiveSegDataset(
        pytorch_data_dir=cfg.pytorch_data_dir,
        dataset_name=cfg.dataset_name,
        crop_type=None,
        image_set="train",
        transform=get_transform(small, False, None),
        target_transform=get_transform(small, True, None),
        cfg=cfg,
    )
    imgs = np.stack([dataset[i]["img"] for i in range(n_images)])
    out_dir = join(cfg.output_root, "crf_experiment")
    result = train_crf_codes(cfg, imgs, epochs=epochs, out_dir=out_dir,
                             global_ent_weight=0.1, local_ent_weight=0.1)
    print("final loss:", result["losses"][-1] if len(result["losses"]) else None)


if __name__ == "__main__":
    main()
