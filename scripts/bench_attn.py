#!/usr/bin/env python
"""Microbenchmark: frozen ViT-S/8 trunk forward variants on the real chip.

Times the full backbone forward (batch 32 = img+img_pos of a batch-16 step,
res 224, N=785 tokens) under different attention implementations. Scalar-sync
method (block_until_ready is unreliable on the tunneled platform) and long
warmup (first ~10 executions run ~2.7x slow — CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from stego_tpu.models.vit import VIT_CONFIGS, init_vit_params, \
    vit_get_intermediate_feat

B, RES = 32, 224
WARMUP, STEPS = 14, 30


def timeit(name, fn, *args):
    t_c0 = time.perf_counter()
    out = fn(*args)
    float(out)
    compile_s = time.perf_counter() - t_c0
    for _ in range(WARMUP):
        out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(out)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:36s} {dt*1e3:8.2f} ms/fwd   (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    cfg = VIT_CONFIGS["vit_small"][8]
    key = jax.random.PRNGKey(0)
    params = init_vit_params(key, cfg)
    img = jax.random.normal(jax.random.fold_in(key, 1), (B, RES, RES, 3),
                            jnp.float32)
    img = jax.device_put(img)
    params = jax.device_put(params)

    def make(use_flash):
        @jax.jit
        def f(p, x):
            feats, _, _ = vit_get_intermediate_feat(
                p, x, cfg, n=1, dtype=jnp.bfloat16, want_attn_qkv=False,
                use_flash=use_flash)
            return jnp.sum(feats[0].astype(jnp.float32))
        return f

    t_e = timeit("einsum scan (default)", make(False), params, img)

    import stego_tpu.ops.flash_attention as fa
    t_new = timeit("unrolled + batch_resident", make(True), params, img)

    orig = fa.trunk_attention
    fa.trunk_attention = lambda q, k, v, s: fa.resident_attention(q, k, v, s)
    try:
        t_old = timeit("unrolled + per-head resident", make(True), params, img)
    finally:
        fa.trunk_attention = orig

    print(f"\nspeedups vs einsum: new {t_e/t_new:.2f}x, old {t_e/t_old:.2f}x")


if __name__ == "__main__":
    main()
