"""Linear-probe loss: bilinear logit upsampling fused with masked CE.

Semantics match the reference exactly: probe logits at code resolution are
bilinearly upsampled to label resolution and cross-entropy is taken over the
valid pixels (reference src/train_segmentation.py:210-218 — F.interpolate +
F.cross_entropy(ignore_index)). The naive NHWC composition is the single most
expensive non-trunk piece of the train step (~12 ms of a 38 ms step measured
on v5e, scripts/bench_decomp.py): every (B, 224, 224, n_classes) intermediate
puts the ~27-wide class axis on the lane dimension, which the TPU pads to 128
lanes — ~4.7x wasted HBM traffic — and the log-softmax/gather chain makes
several such passes, forward and backward.

This op instead:

* transposes ONCE at code resolution (cheap: (B, 28, 28, C)) to channel-major
  (B, C, h, w), so every full-resolution tensor tiles densely on its (H, W)
  minor dims;
* upsamples via the same torch-parity separable weight matrices as
  :mod:`stego_tpu.ops.interp` (two MXU matmuls over the trailing dims);
* evaluates logsumexp and the one-hot logit pickup as channel-axis reductions
  that XLA fuses into a couple of dense passes (no 128-lane padding, no
  per-pixel gather).

Measured: ~12.4 ms -> ~1 ms for the probe-CE chain (ViT-S/8 res-224 batch-16
step, v5e).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stego_tpu.ops.interp import _weight_matrices


def upsampled_masked_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    n_classes: int,
    compute_dtype=None,
) -> jnp.ndarray:
    """Mean CE of bilinearly-upsampled logits over valid-label pixels.

    Args:
      logits: (B, h, w, C) class logits at code resolution.
      labels: (B, H, W) integer labels; pixels outside [0, n_classes) are
        ignored (reference ignore_index semantics).
      n_classes: number of valid classes (C may exceed it; extra channels
        still participate in the softmax, matching the reference where
        C == n_classes always).
      compute_dtype: dtype for the upsample matmuls and the materialized
        (B, C, H, W) field. Defaults to the logits dtype; pass jnp.float32
        for exact-parity evaluation, bfloat16 halves the dominant HBM
        traffic of an auxiliary probe loss.
    Returns: scalar f32 loss.
    """
    b, h, w, c = logits.shape
    out_hw = (int(labels.shape[1]), int(labels.shape[2]))
    dt = compute_dtype or logits.dtype
    x = logits.astype(dt).transpose(0, 3, 1, 2)  # (B, C, h, w) — tiny here

    if (h, w) == out_hw:
        up = x
    else:
        wh, ww = _weight_matrices((h, w), out_hw, "bilinear", False)
        wh = jnp.asarray(wh, dt)
        ww = jnp.asarray(ww, dt)
        # up[b,c,i,j] = sum_{u,v} WH[i,u] WW[j,v] x[b,c,u,v]
        up = jax.lax.dot_general(
            x, wh, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)  # (B, C, w, H)
        up = jax.lax.dot_general(
            up, ww, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)  # (B, C, H, W)

    # channel-axis reductions read the (B, C, H, W) field in its native dtype
    # (an upfront f32 cast would materialize a 4x-larger copy); exp/log/sums
    # accumulate in f32.
    m = jnp.max(up, axis=1)                                   # (B, H, W)
    lse = m.astype(jnp.float32) + jnp.log(
        jnp.sum(jnp.exp((up - m[:, None]).astype(jnp.float32)), axis=1)
    )
    cls = jnp.arange(c, dtype=labels.dtype)[None, :, None, None]
    onehot = (labels[:, None] == cls).astype(dt)
    picked = jnp.sum((up * onehot).astype(jnp.float32), axis=1)  # z_{y_p}
    mask = (labels >= 0) & (labels < n_classes)
    nll = jnp.where(mask, lse - picked, 0.0)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(nll) / denom


def upsampled_argmax(logits: jnp.ndarray, out_hw) -> jnp.ndarray:
    """argmax over classes of bilinearly-upsampled logits, channel-major.

    Equivalent to ``argmax(interpolate(logits, out_hw), -1)`` but every
    full-resolution tensor keeps its (H, W) dims minor (no 128-lane padding of
    the class axis). Used by the validation/eval steps, where both probes'
    predictions reduce to this form: bilinear resize commutes with affine maps
    (weight rows sum to 1), and cosine-cluster argmax is invariant to the
    per-pixel code norm — so ``argmax(probe(interpolate(code)))`` (reference
    train_segmentation.py:257-268 order) equals
    ``upsampled_argmax(probe_logits(code))`` exactly.

    Args:
      logits: (B, h, w, C) at code resolution (f32 compute for parity).
      out_hw: (H, W) target size.
    Returns: (B, H, W) int32 predictions.
    """
    b, h, w, c = logits.shape
    out_hw = (int(out_hw[0]), int(out_hw[1]))
    x = logits.astype(jnp.float32).transpose(0, 3, 1, 2)
    if (h, w) != out_hw:
        wh, ww = _weight_matrices((h, w), out_hw, "bilinear", False)
        x = jax.lax.dot_general(
            x, jnp.asarray(wh), (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        x = jax.lax.dot_general(
            x, jnp.asarray(ww), (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return jnp.argmax(x, axis=1).astype(jnp.int32)
