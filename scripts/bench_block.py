#!/usr/bin/env python
"""Decompose ViT-S/8 trunk cost: which part of the block burns the time?

Times 12-layer chains of individual block components (batch 32, N=785,
bf16) with the scalar-sync method.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from stego_tpu.models.vit import (
    VIT_CONFIGS,
    _layer_norm,
    init_vit_params,
)

B, N = 32, 785
WARMUP, STEPS = 14, 30
cfg = VIT_CONFIGS["vit_small"][8]
D = cfg.embed_dim


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
    print(f"{name:40s} {dt*1e3:8.2f} ms   (compile {tc:.0f}s)", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    params = jax.device_put(init_vit_params(key, cfg))
    blocks = params["blocks"]
    x0 = jax.device_put(
        jax.random.normal(jax.random.fold_in(key, 1), (B, N, D), jnp.bfloat16))

    def scan12(step):
        @jax.jit
        def f(blocks, x):
            def body(c, blk):
                return step(blk, c), None
            out, _ = jax.lax.scan(body, x, blocks)
            return jnp.sum(out.astype(jnp.float32))
        return f

    # --- full block (einsum attention), for reference
    def full_block(blk, x):
        from stego_tpu.models.vit import _block
        out, _, _ = _block(blk, x, cfg)
        return out

    # --- MLP half only: ln2 + fc1 + gelu + fc2 + residual
    def mlp_only(blk, x):
        h = _layer_norm(blk["norm2"], x, cfg.ln_eps)
        h = h @ blk["mlp"]["fc1_kernel"].astype(x.dtype) + blk["mlp"]["fc1_bias"].astype(x.dtype)
        h = jax.nn.gelu(h, approximate=False)
        h = h @ blk["mlp"]["fc2_kernel"].astype(x.dtype) + blk["mlp"]["fc2_bias"].astype(x.dtype)
        return x + h

    # --- MLP with tanh-approx gelu
    def mlp_tanh(blk, x):
        h = _layer_norm(blk["norm2"], x, cfg.ln_eps)
        h = h @ blk["mlp"]["fc1_kernel"].astype(x.dtype) + blk["mlp"]["fc1_bias"].astype(x.dtype)
        h = jax.nn.gelu(h, approximate=True)
        h = h @ blk["mlp"]["fc2_kernel"].astype(x.dtype) + blk["mlp"]["fc2_bias"].astype(x.dtype)
        return x + h

    # --- MLP without gelu (pure matmuls)
    def mlp_nogelu(blk, x):
        h = _layer_norm(blk["norm2"], x, cfg.ln_eps)
        h = h @ blk["mlp"]["fc1_kernel"].astype(x.dtype)
        h = h @ blk["mlp"]["fc2_kernel"].astype(x.dtype)
        return x + h

    # --- qkv proj + out proj only (attention core replaced by slice)
    def proj_only(blk, x):
        h = _layer_norm(blk["norm1"], x, cfg.ln_eps)
        qkv = h @ blk["attn"]["qkv_kernel"].astype(x.dtype) + blk["attn"]["qkv_bias"].astype(x.dtype)
        o = qkv[..., :D]
        o = o @ blk["attn"]["proj_kernel"].astype(x.dtype) + blk["attn"]["proj_bias"].astype(x.dtype)
        return x + o

    # --- attention half complete (einsum core)
    def attn_half(blk, x):
        from stego_tpu.models.vit import _attention
        y, _, _ = _attention(blk["attn"], _layer_norm(blk["norm1"], x, cfg.ln_eps),
                             cfg.num_heads, want_qkv=False)
        return x + y

    timeit("12x full block (einsum)", scan12(full_block), blocks, x0)
    timeit("12x attn half (ln+qkv+core+proj)", scan12(attn_half), blocks, x0)
    timeit("12x proj only (no attn core)", scan12(proj_only), blocks, x0)
    timeit("12x mlp (exact gelu)", scan12(mlp_only), blocks, x0)
    timeit("12x mlp (tanh gelu)", scan12(mlp_tanh), blocks, x0)
    timeit("12x mlp (no gelu)", scan12(mlp_nogelu), blocks, x0)


if __name__ == "__main__":
    main()
