"""Forward-only flash attention for the frozen ViT trunk.

The backbone never trains (STEGO distills from a frozen DINO ViT), so its
attention needs no backward pass — a lean online-softmax Pallas kernel that
never materializes the (N x N) attention matrix in HBM. At 448-res inference
(N=3137 tokens) the standard path's per-layer logits are
B·H·N²·4B ≈ 236 MB/image-batch-layer of HBM traffic; this kernel keeps the
running (max, sum, accumulator) in VMEM.

Used for the scanned (non-output) transformer blocks; the last-n blocks that
must return attention probabilities / qkv keep the standard einsum path
(vision_transformer.py:225-237 semantics need the full attention tensor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 128
TK = 128
NEG_BIG = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, scale, n_real, n_k_tiles):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, NEG_BIG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    # mask padded key columns
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kk * TK
    s = jnp.where(col < n_real, s, NEG_BIG)

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[...] = acc_scr[...] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kk == n_k_tiles - 1)
    def _():
        o_ref[0] = (acc_scr[...] / l_scr[:, :1]).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """softmax(q kᵀ · scale) v without materializing the attention matrix.

    Args:
      q, k, v: (B, H, N, d). Forward-only (no VJP — the trunk is frozen).
    Returns: (B, H, N, d), same dtype as v.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, n, d = q.shape
    bh = b * h
    n_pad = -(-n // TQ) * TQ
    d_pad = max(-(-d // 128) * 128, 128)

    def prep(t):
        t = t.reshape(bh, n, d)
        return jnp.pad(t, ((0, 0), (0, n_pad - n), (0, d_pad - d)))

    qp, kp, vp = prep(q), prep(k), prep(v)
    nq, nk = n_pad // TQ, n_pad // TK

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, n_real=n,
                          n_k_tiles=nk),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, TQ, d_pad), lambda b, q, k: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, d_pad), lambda b, q, k: (b, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK, d_pad), lambda b, q, k: (b, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, d_pad), lambda b, q, k: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d_pad), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((TQ, 128), jnp.float32),
            pltpu.VMEM((TQ, 128), jnp.float32),
            pltpu.VMEM((TQ, d_pad), jnp.float32),
        ],
        interpret=bool(interpret),
    )(qp, kp, vp)
    out = out[:, :n, :d].reshape(b, h, n, d)
    return jax.lax.stop_gradient(out)
