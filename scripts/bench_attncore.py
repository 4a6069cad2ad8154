#!/usr/bin/env python
"""Isolate the attention core: 12x chains from a flat (B, N, 3HD) qkv tensor.

Answers: how much of the per-layer attention cost is (a) the q/k/v layout
work (transpose + pad), (b) the two matmuls, (c) the softmax, under each
implementation. Shapes: B=32, H=6, N=785, d=64, bf16.
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

B, H, N, D = 32, 6, 785, 64
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
    print(f"{name:44s} {dt*1e3:8.2f} ms   (compile {tc:.0f}s)", flush=True)
    return dt


def chain12(core):
    """12 applications of core: (B,N,HD) -> (B,N,HD), summed at the end."""
    @jax.jit
    def f(x, w):
        for i in range(12):
            qkv = x @ w[i]
            x = x + core(qkv)
        return jnp.sum(x.astype(jnp.float32))
    return f


def split_heads(qkv):
    q, k, v = jnp.split(qkv, 3, axis=-1)
    def r(t):
        return t.reshape(B, N, H, D).transpose(0, 2, 1, 3)
    return r(q), r(k), r(v)


def merge_heads(o):
    return o.transpose(0, 2, 1, 3).reshape(B, N, HD)


def einsum_core(qkv):
    q, k, v = split_heads(qkv)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * SCALE
    attn = jax.nn.softmax(logits.astype(qkv.dtype), axis=-1)
    return merge_heads(jnp.einsum("bhqk,bhkd->bhqd", attn.astype(qkv.dtype), v))


# ---------------- no-pad batch-resident kernel (transposes outside) --------

def _nopad_kernel(q_ref, k_ref, v_ref, o_ref, *, do_softmax):
    def body(h, c):
        q = q_ref[0, h] * jnp.asarray(SCALE, q_ref.dtype)
        s = jax.lax.dot_general(q, k_ref[0, h], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if do_softmax:
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
        else:
            p, l = s, jnp.ones((s.shape[0], 1), jnp.float32)
        o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, h],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, h] = (o / l).astype(o_ref.dtype)
        return c
    jax.lax.fori_loop(0, H, body, 0)


def nopad_attention(q, k, v, do_softmax=True):
    return pl.pallas_call(
        functools.partial(_nopad_kernel, do_softmax=do_softmax),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, N, D), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, H, N, D), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), v.dtype),
    )(q, k, v)


def nopad_core(qkv):
    q, k, v = split_heads(qkv)
    return merge_heads(nopad_attention(q, k, v))


def nopad_nosoftmax_core(qkv):
    q, k, v = split_heads(qkv)
    return merge_heads(nopad_attention(q, k, v, do_softmax=False))


# ---------------- flat kernel: lane-sliced heads via BlockSpec -------------

def _flat_kernel(q_ref, k_ref, v_ref, o_ref):
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


def flat_core(qkv):
    """Heads carved out of the flat (B, N, 3HD) tensor by BlockSpec lane
    slicing — zero transpose/pad/copy outside the kernel."""
    out = pl.pallas_call(
        _flat_kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, N, D), lambda i, h: (i, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i, h: (i, 0, h + H),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i, h: (i, 0, h + 2 * H),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, D), lambda i, h: (i, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, HD), qkv.dtype),
    )(qkv, qkv, qkv)
    return out


def main():
    key = jax.random.PRNGKey(0)
    x = jax.device_put(jax.random.normal(key, (B, N, HD), jnp.bfloat16))
    w = jax.device_put(0.02 * jax.random.normal(
        jax.random.fold_in(key, 1), (12, HD, 3 * HD), jnp.bfloat16))

    timeit("12x einsum core", chain12(einsum_core), x, w)
    timeit("12x nopad batch-resident", chain12(nopad_core), x, w)
    timeit("12x nopad NO-softmax (matmuls only)",
           chain12(nopad_nosoftmax_core), x, w)
    timeit("12x flat lane-sliced kernel", chain12(flat_core), x, w)

    # sanity: flat matches einsum
    qkv = x @ w[0]
    a = einsum_core(qkv).astype(jnp.float32)
    b = flat_core(qkv).astype(jnp.float32)
    print("flat vs einsum max|diff|:", float(jnp.max(jnp.abs(a - b))))
    c = nopad_core(qkv).astype(jnp.float32)
    print("nopad vs einsum max|diff|:", float(jnp.max(jnp.abs(a - c))))


if __name__ == "__main__":
    main()
