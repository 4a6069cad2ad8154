"""Cluster probe (online spherical k-means) and linear probe.

Behavioral reference: ClusterLookup (src/modules.py:134-161) and the 1x1-conv
linear probe (src/train_segmentation.py:76,210-218). NHWC layout; 1x1 convs are
channel matmuls.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from stego_tpu.ops.math import l2_normalize


def init_cluster_probe(key: jax.Array, dim: int, n_classes: int) -> Dict:
    """Random cluster centers ~ N(0,1) (reference src/modules.py:140)."""
    return {"clusters": jax.random.normal(key, (n_classes, dim), jnp.float32)}


def reset_cluster_probe(key: jax.Array, params: Dict) -> Dict:
    """reset_parameters parity (src/modules.py:142-144)."""
    return {"clusters": jax.random.normal(key, params["clusters"].shape, jnp.float32)}


def cluster_lookup(
    params: Dict,
    x: jnp.ndarray,
    alpha: Optional[float],
    log_probs: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine cluster assignment (reference ClusterLookup.forward,
    src/modules.py:146-161).

    Args:
      x: (B, H, W, C) code.
      alpha: None -> hard one-hot argmax assignment (training);
             float -> softmax(alpha * ips) (inference).
      log_probs: return log_softmax(alpha * ips) instead of (loss, probs).

    Returns:
      log_probs=True: (B, H, W, n_clusters) log probabilities.
      else: (cluster_loss scalar, cluster_probs (B, H, W, n_clusters)).
    """
    normed_clusters = l2_normalize(params["clusters"], axis=1)
    normed_features = l2_normalize(x, axis=-1)
    ips = jnp.einsum(
        "bhwc,nc->bhwn", normed_features, normed_clusters,
        preferred_element_type=jnp.float32,
    )
    if log_probs:
        assert alpha is not None
        return jax.nn.log_softmax(ips * alpha, axis=-1)
    if alpha is None:
        probs = jax.nn.one_hot(
            jnp.argmax(ips, axis=-1), params["clusters"].shape[0], dtype=jnp.float32
        )
    else:
        probs = jax.nn.softmax(ips * alpha, axis=-1)
    loss = -jnp.mean(jnp.sum(probs * ips, axis=-1))
    return loss, probs


def init_linear_probe(key: jax.Array, dim: int, n_classes: int) -> Dict:
    """torch Conv2d(dim, n_classes, 1) default init parity."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / (dim**0.5)
    return {
        "kernel": jax.random.uniform(k1, (dim, n_classes), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(k2, (n_classes,), jnp.float32, -bound, bound),
    }


def linear_probe_logits(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) code -> (B, H, W, n_classes) logits."""
    return x @ params["kernel"] + params["bias"]


def init_decoder(key: jax.Array, dim: int, n_feats: int) -> Dict:
    """1x1-conv decoder for the optional reconstruction loss
    (reference src/train_segmentation.py:78)."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / (dim**0.5)
    return {
        "kernel": jax.random.uniform(k1, (dim, n_feats), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(k2, (n_feats,), jnp.float32, -bound, bound),
    }


def decoder_apply(params: Dict, code: jnp.ndarray) -> jnp.ndarray:
    return code @ params["kernel"] + params["bias"]


def resize_and_classify(params: Dict, x: jnp.ndarray, size: int) -> jnp.ndarray:
    """1x1-conv classifier -> log-softmax -> bilinear upsample (reference
    ResizeAndClassify, src/modules.py:121-131)."""
    from stego_tpu.ops.interp import interpolate

    logp = jax.nn.log_softmax(linear_probe_logits(params, x), axis=-1)
    return interpolate(logp, size, "bilinear", align_corners=False)
