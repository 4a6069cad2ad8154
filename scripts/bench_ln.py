#!/usr/bin/env python
"""Microbenchmark: trunk layernorm variants on the real chip.

Profiling the batch-8 train step attributed ~43% to elementwise fusions,
with the layernorms showing as 12x convert_reduce at ~0.17 ms each vs a
~0.04 ms memory-bound floor (scripts/profile_report.py, TODO.md #6).
Times a 24-LN data-dependent chain (2 LNs/layer x 12 layers) at the hot
trunk shape (B=32 = img+img_pos of a batch-16 step, N=785, D=384, bf16).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from stego_tpu.models.vit import _layer_norm
from stego_tpu.ops.layer_norm import fused_layer_norm

B, N, D = 32, 785, 384
CHAIN = 24
WARMUP, STEPS = 14, 50


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
    print(f"{name:34s} {dt*1e3:8.3f} ms/chain  "
          f"{dt*1e3/CHAIN:6.3f} ms/LN   (compile {tc:.0f}s)", flush=True)
    return dt


def ln_onepass(p, x, eps):
    # E[x^2]-E[x]^2 stats in one reduce pass, f32 accumulation on bf16 reads
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    meansq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = meansq - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def main():
    key = jax.random.PRNGKey(0)
    x0 = jax.device_put(
        jax.random.normal(jax.random.fold_in(key, 1), (B, N, D),
                          jnp.bfloat16))
    p = {"scale": jax.device_put(jnp.ones(D) * 1.1),
         "bias": jax.device_put(jnp.full((D,), 0.05))}
    eps = 1e-6

    def chain(step):
        @jax.jit
        def f(p, x):
            for _ in range(CHAIN):
                x = step(p, x)
            return jnp.sum(x.astype(jnp.float32))
        return f

    # parity check first (interpret off: real chip)
    a = _layer_norm(p, x0, eps)
    b = fused_layer_norm(x0, p["scale"], p["bias"], eps)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                b.astype(jnp.float32))))
    print(f"max |xla - pallas| on chip: {err:.2e}", flush=True)

    timeit("xla current (_layer_norm)", chain(
        lambda p, x: _layer_norm(p, x, eps)), p, x0)
    timeit("xla one-pass stats", chain(
        lambda p, x: ln_onepass(p, x, eps)), p, x0)
    timeit("pallas fused_layer_norm", chain(
        lambda p, x: fused_layer_norm(x, p["scale"], p["bias"], eps)), p, x0)


if __name__ == "__main__":
    main()
