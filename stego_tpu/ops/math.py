"""Small math helpers shared across the loss / probe stack (NHWC layout)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(t: jnp.ndarray, axis: int = -1, eps: float = 1e-10) -> jnp.ndarray:
    """L2-normalize along ``axis`` with torch ``F.normalize`` semantics
    (x / max(||x||, eps); reference src/modules.py:275-276 uses dim=1, eps=1e-10
    on NCHW — here the channel axis is last)."""
    n = jnp.sqrt(jnp.sum(jnp.square(t), axis=axis, keepdims=True))
    return t / jnp.maximum(n, eps)


def tensor_correlation(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs channel inner products between two NHWC maps.

    Reference: ``torch.einsum("nchw,ncij->nhwij")`` (src/modules.py:283-284).
    NHWC equivalent; output (B, H, W, I, J).
    """
    return jnp.einsum("nhwc,nijc->nhwij", a, b)


def one_hot_feats(labels: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """(B, H, W) int labels -> (B, H, W, n_classes) float one-hot
    (reference src/utils.py:65-66, NHWC here)."""
    return jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)


def super_perm(size: int, key: jax.Array) -> jnp.ndarray:
    """Random near-derangement of ``range(size)``.

    Parity with reference ``super_perm`` (src/modules.py:291-295): draw a
    permutation, bump fixed points by one, wrap around. Used to pick "random
    other image" negatives within a batch.
    """
    perm = jax.random.permutation(key, size)
    fixed = perm == jnp.arange(size)
    return jnp.where(fixed, perm + 1, perm) % size


def block_local_super_perm(size: int, key: jax.Array,
                           n_blocks: int = 1) -> jnp.ndarray:
    """Block-diagonal near-derangement: one independent :func:`super_perm`
    per contiguous block of ``size // n_blocks`` rows.

    ``n_blocks == 1`` is exactly :func:`super_perm` (same key consumption).
    With ``n_blocks == mesh_size`` this is the reference's DDP negative
    semantics (src/modules.py:291-295 runs PER PROCESS under Lightning DDP,
    train_segmentation.py:476): every device draws its negatives from its own
    batch shard, so no negative index ever crosses a shard boundary — the
    property that lets the fused-sampling kernel run per-shard under
    shard_map (``negatives_scope=local``).
    """
    if n_blocks <= 1:
        return super_perm(size, key)
    if size % n_blocks:
        raise ValueError(
            f"batch {size} not divisible by negatives blocks {n_blocks}")
    bl = size // n_blocks
    if bl < 2:
        # super_perm(1) is the identity: every "negative" would be the
        # anchor image itself and the neg_inter loss silently degrades.
        raise ValueError(
            f"negatives_scope=local needs >=2 images per shard to draw a "
            f"negative from; got batch {size} over {n_blocks} shards "
            f"({bl}/shard). Raise batch_size or use negatives_scope=global.")
    keys = jax.random.split(key, n_blocks)
    return jnp.concatenate(
        [super_perm(bl, k) + i * bl for i, k in enumerate(keys)])
