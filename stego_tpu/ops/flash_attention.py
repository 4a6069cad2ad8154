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
    interpret: bool | None = None, mesh=None,
) -> jnp.ndarray:
    """softmax(q kᵀ · scale) v without materializing the attention matrix.

    Args:
      q, k, v: (B, H, N, d). Forward-only (no VJP — the trunk is frozen).
      mesh: a >1-device Mesh runs the kernel per batch shard (shard_map; the
        kernel is purely batch-parallel, no collectives needed).
    Returns: (B, H, N, d), same dtype as v.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, d = q.shape[2], q.shape[3]
    n_pad = -(-n // TQ) * TQ
    d_pad = max(-(-d // 128) * 128, 128)
    nk = n_pad // TK

    def run(q, k, v):
        b, h = q.shape[0], q.shape[1]
        bh = b * h

        def prep(t):
            t = t.reshape(bh, n, d)
            return jnp.pad(t, ((0, 0), (0, n_pad - n), (0, d_pad - d)))

        qp, kp, vp = prep(q), prep(k), prep(v)
        out = pl.pallas_call(
            functools.partial(_flash_kernel, scale=scale, n_real=n,
                              n_k_tiles=nk),
            grid=(bh, n_pad // TQ, nk),
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
        return out[:, :n, :d].reshape(b, h, n, d)

    from stego_tpu.parallel.mesh import shard_kernel

    out = shard_kernel(run, mesh, 3)(q, k, v)
    return jax.lax.stop_gradient(out)


def _resident_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_real):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_real, s, NEG_BIG)
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


# largest padded N whose (N x N) f32 logits tile fits comfortably in VMEM
RESIDENT_MAX_N = 1152


def resident_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    interpret: bool | None = None, mesh=None,
) -> jnp.ndarray:
    """Whole-sequence-per-head attention entirely in VMEM.

    For STEGO's moderate sequence lengths (N <= ~1.1k) the logits tile fits
    on-chip, so softmax(QKᵀ)V runs with zero HBM traffic for the N x N matrix
    — measured faster than both XLA's fused attention (2.85 vs 3.35 ms/layer
    at N=785, b*h=192, v5e) and the streaming kernel. Forward-only."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, d = q.shape[2], q.shape[3]
    n_pad = -(-n // 128) * 128
    assert n_pad <= RESIDENT_MAX_N, "use flash_attention for long sequences"

    def run(q, k, v):
        b, h = q.shape[0], q.shape[1]
        bh = b * h

        def prep(t):
            return jnp.pad(t.reshape(bh, n, d),
                           ((0, 0), (0, n_pad - n), (0, 0)))

        out = pl.pallas_call(
            functools.partial(_resident_kernel, scale=scale, n_real=n),
            grid=(bh,),
            in_specs=[
                pl.BlockSpec((1, n_pad, d), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
            ] * 3,
            out_specs=pl.BlockSpec((1, n_pad, d), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), v.dtype),
            interpret=bool(interpret),
        )(prep(q), prep(k), prep(v))
        return out[:, :n, :].reshape(b, h, n, d)

    from stego_tpu.parallel.mesh import shard_kernel

    out = shard_kernel(run, mesh, 3)(q, k, v)
    return jax.lax.stop_gradient(out)


def _batch_resident_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_heads):
    """All heads of one batch element per grid step.

    Compared to :func:`_resident_kernel` (one (batch, head) per step): 6x fewer
    grid steps and larger DMA blocks, no explicit sequence padding or column
    masking (blocks cover the exact (N, d) trailing dims; Mosaic's internal
    tile padding is masked out of reductions automatically), scale applied to
    the (N, d) queries instead of the (N, N) logits, probabilities cast to the
    value dtype BEFORE the AV matmul, and the softmax normalizer applied to the
    (N, d) output instead of the (N, N) probabilities. Heads loop via fori_loop
    so Mosaic reuses ONE (N, N) stack buffer (a python unroll allocates one per
    head -> VMEM OOM)."""

    def body(h, carry):
        # Dots stay in the input dtype (bf16 operands, f32 accumulation) —
        # upcasting q/k to f32 forces a multi-pass f32 MXU matmul (~4x slower).
        # For DINO head_dim 64, scale = 0.125 is exact in bf16.
        q = q_ref[0, h] * jnp.asarray(scale, q_ref.dtype)
        s = jax.lax.dot_general(
            q, k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = (o / l).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, n_heads, body, 0)


def batch_resident_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    interpret: bool | None = None, mesh=None,
    heads_per_step: int | None = None,
) -> jnp.ndarray:
    """VMEM-resident attention, ``heads_per_step`` heads of one batch element
    per grid step (default: all heads — the measured ViT-S fast path).

    ``heads_per_step`` exists for wide-head models (ViT-B: 12 bf16 heads
    overflow the 16 MiB scoped-VMEM stack); a head slice keeps the fat DMA
    blocks while halving the per-step footprint."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    _, h, n, d = q.shape
    hs = h if heads_per_step is None else int(heads_per_step)
    assert h % hs == 0, (h, hs)
    n_pad = -(-n // 128) * 128
    assert n_pad <= RESIDENT_MAX_N, "use flash_attention for long sequences"

    def run(q, k, v):
        b = q.shape[0]
        return pl.pallas_call(
            functools.partial(_batch_resident_kernel, scale=scale,
                              n_heads=hs),
            grid=(b, h // hs),
            in_specs=[
                pl.BlockSpec((1, hs, n, d), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
            ] * 3,
            out_specs=pl.BlockSpec((1, hs, n, d), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h, n, d), v.dtype),
            interpret=bool(interpret),
        )(q, k, v)

    from stego_tpu.parallel.mesh import shard_kernel

    out = shard_kernel(run, mesh, 3)(q, k, v)
    return jax.lax.stop_gradient(out)


def _kv_resident_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_real):
    """One query tile against the WHOLE key/value sequence.

    K and V for one (batch, head) stay resident in VMEM (their BlockSpec
    index is constant across the query-tile axis, so Mosaic DMAs them once);
    each grid step computes a full (TQ_KV, N) logits row in one shot — plain
    softmax, no online rescaling, no per-128x128-tile revisits (the earlier
    streaming kernel's 30k tiny grid steps were overhead-bound: 3.4x slower
    than einsum at N=3137)."""
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_real, s, NEG_BIG)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


TQ_KV = 512  # query rows per grid step in the kv-resident kernel


def kv_resident_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    interpret: bool | None = None, mesh=None,
) -> jnp.ndarray:
    """Long-sequence attention with K/V resident in VMEM (res-448 regime).

    At N=3137 (448-res ViT-S/8, reference Colab-demo footprint) the einsum
    path writes+reads ~945 MB of N^2 logits per layer; here the only HBM
    traffic is q/o tiles plus one K/V fetch per (batch, head)
    (~0.8 MB bf16). VMEM per step: K+V ~0.8 MB + a (512, N_pad) f32 logits
    tile (~6.6 MB at N=3200). Forward-only (frozen trunk).

    Measured on v5e (ViT-S/8 bf16, res 448, b=8): 12-layer trunk fwd
    63.6 ms (einsum) -> 41.9 ms, and the unrolled-kernel trunk compiles in
    ~9 s where the einsum-in-scan trunk takes ~280 s cold."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, d = q.shape[2], q.shape[3]
    nq_pad = -(-n // TQ_KV) * TQ_KV
    nk_pad = -(-n // 128) * 128

    def run(q, k, v):
        b, h = q.shape[0], q.shape[1]
        bh = b * h

        def prep(t, n_pad):
            t = t.reshape(bh, n, d)
            return jnp.pad(t, ((0, 0), (0, n_pad - n), (0, 0)))

        qp = prep(q, nq_pad)
        kp, vp = prep(k, nk_pad), prep(v, nk_pad)
        out = pl.pallas_call(
            functools.partial(_kv_resident_kernel, scale=scale, n_real=n),
            grid=(bh, nq_pad // TQ_KV),
            in_specs=[
                pl.BlockSpec((1, TQ_KV, d), lambda i, t: (i, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk_pad, d), lambda i, t: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk_pad, d), lambda i, t: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TQ_KV, d), lambda i, t: (i, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), v.dtype),
            interpret=bool(interpret),
        )(qp, kp, vp)
        return out[:, :n, :].reshape(b, h, n, d)

    from stego_tpu.parallel.mesh import shard_kernel

    out = shard_kernel(run, mesh, 3)(q, k, v)
    return jax.lax.stop_gradient(out)


# largest padded N the kv-resident kernel takes: its (TQ_KV, N_pad) f32
# logits tile + K/V residency must fit VMEM with double-buffering headroom
# (at 4096: 512*4096*4 = 8.4 MB logits + ~2 MB bf16 K/V). Beyond this,
# trunk_attention returns None and the caller's einsum path runs — a
# graceful fallback instead of a VMEM OOM at compile time.
KV_RESIDENT_MAX_N = 4096

# scoped-VMEM budget for one batch-resident grid step: q/k/v/out blocks are
# double-buffered by the pipeline, plus one (N_pad, N_pad) f32 logits stack
# buffer (reused across the head fori_loop). The hardware scoped limit is
# 16 MiB; ViT-B/8 at res 224 (h=12, N_pad=896, bf16) measures 16.91 MiB and
# OOMs at compile, while ViT-S (h=6) sits at ~8.7 MiB — dispatch decides.
BATCH_RESIDENT_VMEM_BUDGET = 13 * 2**20


def _batch_resident_fits(h: int, n_pad: int, d: int, itemsize: int) -> bool:
    io = 4 * h * n_pad * d * itemsize * 2  # q,k,v,out blocks, double-buffered
    logits = n_pad * n_pad * 4
    return io + logits <= BATCH_RESIDENT_VMEM_BUDGET


def trunk_attention(q, k, v, scale, mesh=None):
    """Best forward-only attention for the frozen trunk: the all-heads-per-
    step VMEM-resident kernel when its blocks fit the scoped-VMEM budget
    (ViT-S), the one-(batch, head)-per-step variant when they don't (ViT-B's
    12 heads), the kv-resident kernel for longer sequences (res-448:
    measured vs einsum below), or None — meaning "use the einsum path" —
    when even that would blow VMEM."""
    _, h, n, d = q.shape
    n_pad = -(-n // 128) * 128
    if n_pad <= RESIDENT_MAX_N:
        itemsize = jnp.dtype(q.dtype).itemsize
        # largest head slice per grid step that fits the scoped-VMEM budget
        for hs in range(h, 0, -1):
            if h % hs == 0 and _batch_resident_fits(hs, n_pad, d, itemsize):
                return batch_resident_attention(q, k, v, scale, mesh=mesh,
                                                heads_per_step=hs)
        return resident_attention(q, k, v, scale, mesh=mesh)
    if n_pad <= KV_RESIDENT_MAX_N:
        return kv_resident_attention(q, k, v, scale, mesh=mesh)
    return None


def _pair_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Two heads per grid step from TOKEN-MAJOR (B, N, H·d) q/k/v.

    Each block is one native 128-lane slice (= one adjacent head pair at
    d=64) of the dense projection output; static 64-lane halves split the
    pair in-register. Same max-subtracted one-pass softmax as
    :func:`_batch_resident_kernel`."""
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    d = q.shape[-1] // 2

    def one(qh, kh, vh):
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (o / l).astype(o_ref.dtype)

    o_ref[0] = jnp.concatenate(
        [one(q[:, :d], k[:, :d], v[:, :d]),
         one(q[:, d:], k[:, d:], v[:, d:])], axis=1)


def pair_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int,
    scale: float, interpret: bool | None = None, mesh=None,
) -> jnp.ndarray:
    """Token-major attention: q/k/v AND the output stay (B, N, H·d).

    The head-major layout the anterior kernels consume costs real step time
    twice: the q/k/v projections must fold a transpose into their output
    layout (measured ~48% MXU efficiency vs ~97% for a dense
    (B,N,D)x(D,D) dot — round-4 ViT-B profile), and the attention output
    needs the inverse relayout before the out-projection. This kernel reads
    adjacent head PAIRS as native 128-lane block slices of the dense
    projection outputs (d=64: one pair per 128 lanes, no lane padding, no
    strided DMA — unlike the rejected packed-qkv kernel whose (N,3,128)
    blocks strided a 3x-wider array) and writes token-major blocks the
    out-projection consumes directly.

    Measured on v5e (12 chained attention sublayers incl. projections,
    bf16): ViT-B b=32 N=785: 27.2 (head-major batch-resident hs=6) ->
    19.95 ms; exact match (bf16 noise) vs the einsum oracle
    (scripts/bench_attn_vitb.py).

    Requires head_dim == 64 and an even head count; forward-only.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, n, hd = q.shape
    d = hd // num_heads
    assert d == 64 and num_heads % 2 == 0, (num_heads, d)
    n_pad = -(-n // 128) * 128
    assert n_pad <= RESIDENT_MAX_N, "pair kernel is for moderate N"

    def run(q, k, v):
        bs = q.shape[0]
        return pl.pallas_call(
            functools.partial(_pair_kernel, scale=scale),
            grid=(bs, num_heads // 2),
            in_specs=[pl.BlockSpec((1, n, 2 * d), lambda i, p: (i, 0, p),
                                   memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec((1, n, 2 * d), lambda i, p: (i, 0, p),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, n, hd), v.dtype),
            interpret=bool(interpret),
        )(q, k, v)

    from stego_tpu.parallel.mesh import shard_kernel

    out = shard_kernel(run, mesh, 3)(q, k, v)
    return jax.lax.stop_gradient(out)


def _pair_kv_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    """One query ROW-TILE of one head pair against the pair's WHOLE K/V.

    Token-major kv-resident variant (round 5): K and V arrive as native
    128-lane head-pair slices of the dense (B, N, H·d) projections and stay
    VMEM-resident across the query-tile axis (their block index is constant
    over it); each grid step computes a (TQ_PAIR, N) logits row per head —
    plain softmax, no online rescaling. Blocks cover the exact key length
    (Mosaic's internal tile padding is masked out of reductions), so no
    explicit column mask is needed."""
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    d = q.shape[-1] // 2

    def one(qh, kh, vh):
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vh.dtype), vh,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (o / l).astype(o_ref.dtype)

    o_ref[0] = jnp.concatenate(
        [one(q[:, :d], k[:, :d], v[:, :d]),
         one(q[:, d:], k[:, d:], v[:, d:])], axis=1)


TQ_PAIR = 256  # query rows per grid step in the kv-resident pair kernel


def pair_kv_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int,
    scale: float, interpret: bool | None = None, mesh=None,
) -> jnp.ndarray:
    """Token-major long-sequence attention (res-320/448 regime).

    Same layout win as :func:`pair_attention` — q/k/v AND the output stay
    (B, N, H·d), so the projections run as dense ~97%-MXU dots and no
    head-major relayout exists in the sublayer — extended past
    RESIDENT_MAX_N by keeping each head pair's K/V resident in VMEM and
    streaming TQ_PAIR-row query tiles (the round-4 VERDICT's named gap:
    res-320 flip-TTA eval, the reference's headline user journey
    `src/eval_segmentation.py:119-126`, previously fell back to the
    head-major kv-resident path).

    VMEM per step at N=3200: two (TQ_PAIR, N) f32 logits ≈ 6.6 MB +
    K/V pair blocks ≈ 1.6 MB bf16 — inside the scoped budget where a
    resident (N, N) tile would blow it. Requires head_dim == 64 and an even
    head count; forward-only (frozen trunk).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, n, hd = q.shape
    d = hd // num_heads
    assert d == 64 and num_heads % 2 == 0, (num_heads, d)
    # the (TQ_PAIR, N) logits blocks scale with N — past the budget every
    # gated caller falls back (use_pair_attention / trunk_attention); direct
    # callers must not silently compile into a Mosaic VMEM OOM
    assert -(-n // 128) * 128 <= KV_RESIDENT_MAX_N, (
        f"pair_kv_attention: N={n} exceeds KV_RESIDENT_MAX_N="
        f"{KV_RESIDENT_MAX_N}; use flash/einsum attention for longer "
        f"sequences")
    nq_pad = -(-n // TQ_PAIR) * TQ_PAIR

    def run(q, k, v):
        bs = q.shape[0]
        qp = jnp.pad(q, ((0, 0), (0, nq_pad - n), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_pair_kv_kernel, scale=scale),
            grid=(bs, num_heads // 2, nq_pad // TQ_PAIR),
            in_specs=[
                pl.BlockSpec((1, TQ_PAIR, 2 * d),
                             lambda i, p, t: (i, t, p),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, 2 * d), lambda i, p, t: (i, 0, p),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, 2 * d), lambda i, p, t: (i, 0, p),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TQ_PAIR, 2 * d),
                                   lambda i, p, t: (i, t, p),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bs, nq_pad, hd), v.dtype),
            interpret=bool(interpret),
        )(qp, k, v)
        return out[:, :n, :]

    from stego_tpu.parallel.mesh import shard_kernel

    out = shard_kernel(run, mesh, 3)(q, k, v)
    return jax.lax.stop_gradient(out)


def use_pair_attention(num_heads: int, head_dim: int, n: int) -> bool:
    """Dispatch predicate for the token-major pair kernels (DINO ViT-S/B at
    every supported resolution: the VMEM-resident pair kernel up to
    RESIDENT_MAX_N, the kv-resident pair kernel beyond — res-320 eval /
    res-448 demo). vit_tiny's odd head count falls back to the head-major
    kernels."""
    n_pad = -(-n // 128) * 128
    return (head_dim == 64 and num_heads % 2 == 0
            and n_pad <= KV_RESIDENT_MAX_N)


def token_major_attention(q, k, v, num_heads, scale, mesh=None):
    """Dispatch between the two token-major pair kernels by sequence length
    (both consume/produce dense (B, N, H·d); gate with
    :func:`use_pair_attention`)."""
    n = q.shape[1]
    n_pad = -(-n // 128) * 128
    if n_pad <= RESIDENT_MAX_N:
        return pair_attention(q, k, v, num_heads, scale, mesh=mesh)
    return pair_kv_attention(q, k, v, num_heads, scale, mesh=mesh)


def _packed_kernel(qkv_ref, o_ref, *, scale):
    """Two heads per grid step from a token-major packed-qkv block.

    The block arrives as (N, 3, 128): q/k/v stacked on the middle axis, one
    head PAIR on the 128-lane axis (head_dim 64). Static 64-lane half-slices
    split the pair; each head runs the same max-subtracted softmax math as
    :func:`_batch_resident_kernel`. Both heads' outputs are written back as
    one 128-lane block, so the surrounding program never materializes a
    head-major (B, H, N, d) relayout of qkv OR of the attention output —
    the kernel reads the qkv projection's natural (B, N, 3, H*d) reshape and
    writes the (B, N, H*d) layout the output projection consumes.

    MEASURED SLOWER than :func:`batch_resident_attention` + XLA relayouts on
    v5e (ViT-S/8 res-224 b=32 trunk fwd: 29.2 vs 21.5 ms): the strided
    (N, 3, 128)-of-(N, 3, 384) block DMA and the in-register 64-lane
    half-slices cost more than the head-major transposes they avoid. Kept as
    a tested reference point for layout experiments; not dispatched."""
    blk = qkv_ref[0]  # (N, 3, 128)
    q = blk[:, 0, :] * jnp.asarray(scale, blk.dtype)
    k = blk[:, 1, :]
    v = blk[:, 2, :]

    def one_head(qh, kh, vh):
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (o / l).astype(o_ref.dtype)

    o0 = one_head(q[:, :64], k[:, :64], v[:, :64])
    o1 = one_head(q[:, 64:], k[:, 64:], v[:, 64:])
    o_ref[0] = jnp.concatenate([o0, o1], axis=1)


def packed_attention(
    qkv: jnp.ndarray, num_heads: int, scale: float,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Attention straight from the packed qkv projection output.

    Args:
      qkv: (B, N, 3, H*d) — a pure reshape of the qkv linear's (B, N, 3*H*d)
        output (feature order [q|k|v] x [head] x [dim], torch DINO layout).
      num_heads: H; head_dim must be 64 and H even (ViT-S/-B; vit_tiny's
        H=3 falls back to :func:`batch_resident_attention` upstream).
    Returns: (B, N, H*d) attention output, token-major. Forward-only.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, n, three, hd = qkv.shape
    assert three == 3 and hd % num_heads == 0
    d = hd // num_heads
    assert d == 64 and num_heads % 2 == 0, "packed kernel needs d=64, even H"
    n_pairs = num_heads // 2

    out = pl.pallas_call(
        functools.partial(_packed_kernel, scale=scale),
        grid=(b, n_pairs),
        in_specs=[
            pl.BlockSpec((1, n, 3, 128), lambda i, p: (i, 0, 0, p),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, 128), lambda i, p: (i, 0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
        interpret=bool(interpret),
    )(qkv)
    return jax.lax.stop_gradient(out)
