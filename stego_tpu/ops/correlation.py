"""Contrastive feature-correspondence loss — the STEGO hot loop.

Behavioral reference: ContrastiveCorrelationLoss (src/modules.py:314-398).
This module is the *einsum oracle*: straight-line JAX that XLA fuses well at the
reference's sampled sizes (feature_samples=11 -> 121x121 correspondence tiles).
The Pallas kernel in :mod:`stego_tpu.ops.pallas_corr` computes the same math
blockwise for full-field (HW x HW) resolution without materializing
correspondence tensors in HBM; this file is its correctness oracle.

Layout: NHWC. Feature inputs arrive already stop_gradient'ed (the backbone is
frozen); the code path carries gradients.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from stego_tpu.ops.math import (
    block_local_super_perm,
    l2_normalize,
    tensor_correlation,
)
from stego_tpu.ops.sampling import sample_from_coords


@dataclass(frozen=True)
class CorrLossCfg:
    """Static knobs (reference train_config.yml:40-64)."""

    pointwise: bool = True
    zero_clamp: bool = True
    stabalize: bool = False
    feature_samples: int = 11
    neg_samples: int = 5
    pos_intra_shift: float = 0.18
    pos_inter_shift: float = 0.12
    neg_inter_shift: float = 0.46
    use_salience: bool = False
    # negatives_scope=local on a D-device mesh: each negative derangement is
    # block-diagonal over D contiguous batch blocks (the reference's
    # per-process DDP semantics, src/modules.py:291-295 under
    # train_segmentation.py:476). 1 = global (single-process reference).
    neg_blocks: int = 1

    @classmethod
    def from_config(cls, cfg, neg_blocks: int = 1) -> "CorrLossCfg":
        return cls(
            pointwise=cfg.pointwise,
            zero_clamp=cfg.zero_clamp,
            stabalize=cfg.stabalize,
            feature_samples=cfg.feature_samples,
            neg_samples=cfg.neg_samples,
            pos_intra_shift=cfg.pos_intra_shift,
            pos_inter_shift=cfg.pos_inter_shift,
            neg_inter_shift=cfg.neg_inter_shift,
            use_salience=cfg.use_salience,
            neg_blocks=neg_blocks,
        )


def corr_loss_helper(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    c1: jnp.ndarray,
    c2: jnp.ndarray,
    shift: float,
    cfg: CorrLossCfg,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-pair loss surface (reference helper, src/modules.py:325-347).

    fd: feature correspondence (no grad — frozen backbone), optionally
    "pointwise" mean-centered per query while preserving the global mean
    (:330-333). cd: code correspondence (carries grad). Loss element:
    ``-clamp(cd) * (fd - shift)``.

    All inputs (B, H, W, C)-shaped samples. Returns (loss (B,H,W,I,J), cd).
    """
    fd = tensor_correlation(l2_normalize(f1), l2_normalize(f2))
    fd = jax.lax.stop_gradient(fd)
    if cfg.pointwise:
        # fd - rowmean + globalmean: algebraically identical to the reference's
        # old_mean / re-centering dance (the intermediate's global mean is 0).
        # Under negatives_scope=local (neg_blocks=D) the "global" mean is
        # per contiguous batch block — what each reference DDP process
        # computes for ITS local batch (src/modules.py:330-333 runs per
        # process under train_segmentation.py:476).
        d = cfg.neg_blocks
        if d > 1:
            b = fd.shape[0]
            if b % d:
                raise ValueError(
                    f"batch {b} not divisible by negatives blocks {d} "
                    "(negatives_scope=local needs batch % mesh size == 0)")
            om = jnp.mean(fd.reshape(d, -1), axis=1)
            old_mean = jnp.repeat(om, b // d).reshape(
                (b,) + (1,) * (fd.ndim - 1))
        else:
            old_mean = jnp.mean(fd)
        fd = fd - jnp.mean(fd, axis=(3, 4), keepdims=True) + old_mean

    cd = tensor_correlation(l2_normalize(c1), l2_normalize(c2))

    min_val = 0.0 if cfg.zero_clamp else -9999.0
    cd_clamped = jnp.clip(cd, min_val, 0.8) if cfg.stabalize else jnp.maximum(
        cd, min_val
    )
    loss = -cd_clamped * (fd - shift)
    return loss, cd


def sample_nonzero_locations(
    key: jax.Array, t: jnp.ndarray, n_per_img: int
) -> jnp.ndarray:
    """Sample normalized coords uniformly over nonzero mask entries
    (reference sample_nonzero_locations, src/modules.py:298-311), falling back
    to uniform when a mask is empty. Fixed-shape via categorical sampling.

    Args:
      t: (B, H, W) salience mask.
    Returns: (B, n_per_img, 2) coords in [-1, 1], (x, y) order.
    """
    b, h, w = t.shape
    flat = (t.reshape(b, h * w) > 0)
    any_nonzero = jnp.any(flat, axis=1, keepdims=True)
    logits = jnp.where(flat | ~any_nonzero, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits[:, None, :], axis=-1,
                                 shape=(b, n_per_img))
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    # reference normalizes both axes by H (src/modules.py:309) — kept for parity
    coords_yx = jnp.stack([ys, xs], axis=-1) / float(h)
    coords_yx = coords_yx * 2.0 - 1.0
    return jnp.flip(coords_yx, axis=-1)


def _draw_coords(
    key: jax.Array,
    b: int,
    s: int,
    salience: Optional[jnp.ndarray],
    cfg: CorrLossCfg,
) -> jnp.ndarray:
    """(B, S, S, 2) coords in [-1,1]; salience-biased 90/10 mix when enabled
    (reference src/modules.py:355-364)."""
    if not cfg.use_salience or salience is None:
        return jax.random.uniform(key, (b, s, s, 2), jnp.float32, -1.0, 1.0)
    k1, k2, k3 = jax.random.split(key, 3)
    nz = sample_nonzero_locations(k1, salience, s * s).reshape(b, s, s, 2)
    reg = jax.random.uniform(k2, (b, s, s, 2), jnp.float32, -1.0, 1.0)
    mask = (jax.random.uniform(k3, (b, s, s)) > 0.1).astype(jnp.float32)[..., None]
    return nz * mask + reg * (1.0 - mask)


def contrastive_correlation_loss(
    cfg: CorrLossCfg,
    key: jax.Array,
    orig_feats: jnp.ndarray,
    orig_feats_pos: jnp.ndarray,
    orig_code: jnp.ndarray,
    orig_code_pos: jnp.ndarray,
    orig_salience: Optional[jnp.ndarray] = None,
    orig_salience_pos: Optional[jnp.ndarray] = None,
    sampling_impl: str = "auto",
) -> Dict[str, jnp.ndarray]:
    """Full three-pair loss (reference forward, src/modules.py:349-398).

    Random coords are sampled per pair member; (self,self) and (self,knn-pos)
    pairs plus ``neg_samples`` batch-derangement negatives. Returns a dict with
    scalar 'pos_intra_loss'/'pos_inter_loss', non-reduced 'neg_inter_loss'
    (the caller means it, matching train_segmentation.py:169), and the cd
    tensors for histogram logging. ``sampling_impl`` selects the grid-sample
    implementation (ops/sampling.py).
    """
    b = orig_feats.shape[0]
    s = cfg.feature_samples
    k_c1, k_c2, k_neg = jax.random.split(key, 3)

    coords1 = _draw_coords(k_c1, b, s, orig_salience, cfg)
    coords2 = _draw_coords(k_c2, b, s, orig_salience_pos, cfg)

    def sample(t, c):
        return sample_from_coords(t, c, impl=sampling_impl)

    feats = sample(orig_feats, coords1)
    code = sample(orig_code, coords1)
    feats_pos = sample(orig_feats_pos, coords2)
    code_pos = sample(orig_code_pos, coords2)

    pos_intra_loss, pos_intra_cd = corr_loss_helper(
        feats, feats, code, code, cfg.pos_intra_shift, cfg
    )
    pos_inter_loss, pos_inter_cd = corr_loss_helper(
        feats, feats_pos, code, code_pos, cfg.pos_inter_shift, cfg
    )

    neg_losses = []
    neg_cds = []
    for nk in jax.random.split(k_neg, cfg.neg_samples):
        perm_neg = block_local_super_perm(b, nk, cfg.neg_blocks)
        feats_neg = sample(orig_feats[perm_neg], coords2)
        code_neg = sample(orig_code[perm_neg], coords2)
        neg_inter_loss, neg_inter_cd = corr_loss_helper(
            feats, feats_neg, code, code_neg, cfg.neg_inter_shift, cfg
        )
        neg_losses.append(neg_inter_loss)
        neg_cds.append(neg_inter_cd)
    if not neg_losses:  # neg_samples == 0
        zero = jnp.zeros((1, 1, 1, 1, 1), jnp.float32)
        neg_losses, neg_cds = [zero], [zero]

    return {
        "pos_intra_loss": jnp.mean(pos_intra_loss),
        "pos_intra_cd": pos_intra_cd,
        "pos_inter_loss": jnp.mean(pos_inter_loss),
        "pos_inter_cd": pos_inter_cd,
        "neg_inter_loss": jnp.concatenate(neg_losses, axis=0),
        "neg_inter_cd": jnp.concatenate(neg_cds, axis=0),
    }
