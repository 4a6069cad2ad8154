"""In-training CRF-style contrastive loss.

Behavioral reference: ContrastiveCRFLoss (src/modules.py:437-469): a sampled
Gaussian appearance+position kernel times cluster similarity. Pure einsum math;
off by default (train_config.yml crf_weight: 0.0) but kept for config parity.
NHWC layout.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CRFLossCfg:
    n_samples: int = 1000
    alpha: float = 0.5
    beta: float = 0.15
    gamma: float = 0.05
    w1: float = 10.0
    w2: float = 3.0
    shift: float = 0.0


def contrastive_crf_loss(
    cfg: CRFLossCfg,
    key: jax.Array,
    guidance: jnp.ndarray,
    clusters: jnp.ndarray,
    coords=None,
) -> jnp.ndarray:
    """Args:
      guidance: (B, H, W, Cg) image (e.g. RGB resized to 56).
      clusters: (B, H, W, K) normalized code.
      coords: optional (ys, xs) int arrays for deterministic testing.
    Returns: (B, S, S) negative kernel-weighted cluster similarities.
    """
    b, h, w, _ = guidance.shape
    assert clusters.shape[:3] == guidance.shape[:3]
    s = cfg.n_samples
    if coords is None:
        ky, kx = jax.random.split(key)
        ys = jax.random.randint(ky, (s,), 0, h)
        xs = jax.random.randint(kx, (s,), 0, w)
    else:
        ys, xs = coords

    sel_guidance = guidance[:, ys, xs, :]  # (B, S, Cg)
    sel_clusters = clusters[:, ys, xs, :]  # (B, S, K)

    coords = jnp.stack([ys, xs], axis=0).astype(jnp.float32)  # (2, S)
    coord_diff = jnp.sum(
        jnp.square(coords[:, :, None] - coords[:, None, :]), axis=0
    )  # (S, S)
    guidance_diff = jnp.sum(
        jnp.square(sel_guidance[:, :, None, :] - sel_guidance[:, None, :, :]),
        axis=-1,
    )  # (B, S, S)

    sim_kernel = (
        cfg.w1
        * jnp.exp(-coord_diff[None] / (2 * cfg.alpha) - guidance_diff / (2 * cfg.beta))
        + cfg.w2 * jnp.exp(-coord_diff[None] / (2 * cfg.gamma))
        - cfg.shift
    )

    cluster_sims = jnp.einsum("bik,bjk->bij", sel_clusters, sel_clusters)
    return -(cluster_sims * sim_kernel)
