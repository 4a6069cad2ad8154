#!/usr/bin/env python
"""ViT-B/8 attention layout ladder: head-major kernels vs token-major
lane-sliced kernels, measured through 12 full attention sublayers.

Motivation (round-4 profile, /tmp/prof_vitb): the split q/k/v projections
that fold the head-major transpose into their output layout run at only
~48% MXU efficiency (0.31 ms per 29.6 GF dot at (32,785,768)x(768,768) ->
(32,12,785,64)), while the MLP's dense fc1 hits ~97%. A kernel that consumes
TOKEN-MAJOR (B, N, H*d) q/k/v via lane-sliced BlockSpecs lets all three
projections (and the out-projection input) stay dense — trading in-kernel
lane slicing for ~5+ ms of projection time per ViT-B step.

Each variant times 12 chained sublayers of:
    x + proj_out(attn(q(x), k(x), v(x)))
so projection/output layout costs are inside the measurement.
Shapes: B=32 (img+img_pos of a batch-16 step), H=12, N=785, d=64, bf16.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("BENCH_B", 32))
H, N, D = 12, 785, 64
HD = H * D
WARMUP, STEPS = 14, 30
SCALE = D**-0.5


def timeit(name, fn, *args):
    t0c = time.perf_counter()
    float(fn(*args))
    tc = time.perf_counter() - t0c
    for _ in range(WARMUP):
        out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(out)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:52s} {dt*1e3:8.2f} ms   (compile {tc:.0f}s)", flush=True)
    return dt


def chain12(core):
    """12 sublayers: x += proj(core(q,k,v)); q/k/v are separate projections
    (the trunk's round-3d split form)."""

    @jax.jit
    def f(x, wq, wk, wv, wo):
        for i in range(12):
            x = x + core(x, wq[i], wk[i], wv[i]) @ wo[i]
        return jnp.sum(x.astype(jnp.float32))

    return f


def head_major(x, w):
    y = x @ w
    return y.reshape(B, N, H, D).transpose(0, 2, 1, 3)


def merge_heads(o):
    return o.transpose(0, 2, 1, 3).reshape(B, N, HD)


def einsum_core(x, wq, wk, wv):
    q, k, v = head_major(x, wq), head_major(x, wk), head_major(x, wv)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * SCALE
    attn = jax.nn.softmax(logits.astype(x.dtype), axis=-1)
    return merge_heads(jnp.einsum("bhqk,bhkd->bhqd", attn.astype(x.dtype), v))


def current_core(hs):
    from stego_tpu.ops.flash_attention import batch_resident_attention

    def core(x, wq, wk, wv):
        q, k, v = head_major(x, wq), head_major(x, wk), head_major(x, wv)
        return merge_heads(
            batch_resident_attention(q, k, v, SCALE, heads_per_step=hs))

    return core


# ---- token-major kernels: blocks lane-sliced out of (B, N, HD) arrays ----

def _flat1_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0] * jnp.asarray(SCALE, q_ref.dtype)
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def flat_core(x, wq, wk, wv):
    """One head per grid step, (1, N, 64) blocks lane-sliced from dense
    token-major projections."""
    q, k, v = x @ wq, x @ wk, x @ wv
    return pl.pallas_call(
        _flat1_kernel,
        grid=(B, H),
        in_specs=[pl.BlockSpec((1, N, D), lambda i, h: (i, 0, h),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, N, D), lambda i, h: (i, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, HD), x.dtype),
    )(q, k, v)


def _pair_kernel(q_ref, k_ref, v_ref, o_ref):
    """Two heads per step from one native 128-lane block; static 64-lane
    halves split them in-register."""
    q = q_ref[0] * jnp.asarray(SCALE, q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]

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

    o0 = one(q[:, :D], k[:, :D], v[:, :D])
    o1 = one(q[:, D:], k[:, D:], v[:, D:])
    o_ref[0] = jnp.concatenate([o0, o1], axis=1)


def pair_core(x, wq, wk, wv):
    q, k, v = x @ wq, x @ wk, x @ wv
    return pl.pallas_call(
        _pair_kernel,
        grid=(B, H // 2),
        in_specs=[pl.BlockSpec((1, N, 2 * D), lambda i, p: (i, 0, p),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, N, 2 * D), lambda i, p: (i, 0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, HD), x.dtype),
    )(q, k, v)


def _allheads_kernel(q_ref, k_ref, v_ref, o_ref, s_scr, *, n_heads):
    """All heads of one batch element, token-major (N, HD) blocks; python
    loop over heads with static lane slices. One explicit (N, N) f32 scratch
    keeps the logits footprint constant across the unrolled heads."""
    for h in range(n_heads):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[0, :, sl] * jnp.asarray(SCALE, q_ref.dtype)
        s_scr[...] = jax.lax.dot_general(
            q, k_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s_scr[...]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, :, sl],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


def allheads_core(x, wq, wk, wv):
    q, k, v = x @ wq, x @ wk, x @ wv
    return pl.pallas_call(
        functools.partial(_allheads_kernel, n_heads=H),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, N, HD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, N, HD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, HD), x.dtype),
        scratch_shapes=[pltpu.VMEM((N, N), jnp.float32)],
    )(q, k, v)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.device_put(jax.random.normal(key, (B, N, HD), jnp.bfloat16))

    def mk(i):
        return jax.device_put(0.02 * jax.random.normal(
            jax.random.fold_in(key, i), (12, HD, HD), jnp.bfloat16))

    wq, wk, wv, wo = mk(1), mk(2), mk(3), mk(4)

    # correctness first (cheap, catches slicing bugs before long timings)
    # NOTE: flat_core (64-lane blocks) is REJECTED by the Pallas lowering —
    # block last dims must be divisible by 128 or equal the array dim. Kept
    # in the file as documentation; not run.
    ref = einsum_core(x, wq[0], wk[0], wv[0]).astype(jnp.float32)
    for name, core in [("pair", pair_core), ("allheads", allheads_core)]:
        try:
            got = core(x, wq[0], wk[0], wv[0]).astype(jnp.float32)
            print(f"{name} vs einsum max|diff|:",
                  float(jnp.max(jnp.abs(ref - got))), flush=True)
        except Exception as e:
            print(f"{name} FAILED: {str(e)[:200]}", flush=True)

    timeit("12x einsum (head-major)", chain12(einsum_core), x, wq, wk, wv, wo)
    timeit("12x batch-resident hs=6 (current dispatch)",
           chain12(current_core(6)), x, wq, wk, wv, wo)
    timeit("12x batch-resident hs=4", chain12(current_core(4)),
           x, wq, wk, wv, wo)
    timeit("12x pair 2-head lane-sliced", chain12(pair_core),
           x, wq, wk, wv, wo)
    try:
        timeit("12x all-heads token-major (scratch logits)",
               chain12(allheads_core), x, wq, wk, wv, wo)
    except Exception as e:
        print("allheads chain FAILED:", str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
