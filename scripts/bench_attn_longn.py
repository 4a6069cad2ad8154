#!/usr/bin/env python
"""Long-N attention layout ladder: head-major kv-resident vs the round-5
token-major kv-resident PAIR kernel, through 12 full attention sublayers.

The round-4 token-major insight (q/k/v projections stay dense ~97%-MXU
(B,N,D) dots; the kernel lane-slices head pairs) stopped at N_pad<=1152, so
the reference's headline user journey — res-320 flip-TTA eval
(src/eval_segmentation.py:119-126) — and the res-448 Colab demo still ran
head-major projections (~48% MXU) feeding kv_resident_attention
(VERDICT r4 weak #2). Each variant here times 12 chained sublayers of
    x + proj_out(attn(q(x), k(x), v(x)))
so projection/output layout costs are inside the measurement.

Footprints: ViT-S/8 H=6 d=64 bf16 at
  res 320: N=1601, B=16 (eval runs two b=8 flip-TTA calls per step)
  res 448: N=3137, B=8  (demo/Colab footprint)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

H, D = 6, 64
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


def make_params(key, n_layers=12):
    ks = jax.random.split(key, n_layers * 4)
    ps = []
    for i in range(n_layers):
        ps.append({
            "qkv_kernel": (jax.random.normal(ks[4 * i], (HD, 3 * HD),
                                             jnp.bfloat16) * 0.02),
            "qkv_bias": jnp.zeros((3 * HD,), jnp.bfloat16),
            "proj_kernel": (jax.random.normal(ks[4 * i + 1], (HD, HD),
                                              jnp.bfloat16) * 0.02),
            "proj_bias": jnp.zeros((HD,), jnp.bfloat16),
        })
    return ps


def chain_headmajor(ps, x, n):
    from stego_tpu.ops.flash_attention import kv_resident_attention

    b = x.shape[0]
    for p in ps:
        wk, bk = p["qkv_kernel"], p["qkv_bias"]

        def _proj(i):
            y = x @ wk[:, i * HD:(i + 1) * HD]
            y = y.reshape(b, n, H, D).transpose(0, 2, 1, 3)
            return y + bk[i * HD:(i + 1) * HD].reshape(H, 1, D)

        q, k, v = _proj(0), _proj(1), _proj(2)
        o = kv_resident_attention(q, k, v, SCALE, interpret=False)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, HD)
        x = x + o @ p["proj_kernel"] + p["proj_bias"]
    return jnp.sum(x.astype(jnp.float32))


def chain_tokenmajor(ps, x, n):
    from stego_tpu.ops.flash_attention import pair_kv_attention

    for p in ps:
        wk, bk = p["qkv_kernel"], p["qkv_bias"]
        q = x @ wk[:, :HD] + bk[:HD]
        k = x @ wk[:, HD:2 * HD] + bk[HD:2 * HD]
        v = x @ wk[:, 2 * HD:] + bk[2 * HD:]
        o = pair_kv_attention(q, k, v, H, SCALE, interpret=False)
        x = x + o @ p["proj_kernel"] + p["proj_bias"]
    return jnp.sum(x.astype(jnp.float32))


def main():
    ps = jax.device_put(make_params(jax.random.PRNGKey(0)))
    for n, b in ((1601, 16), (3137, 8)):
        x = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(1), (b, n, HD),
                              jnp.bfloat16))
        print(f"--- N={n} B={b} (12 sublayers, bf16) ---")
        hm = timeit("head-major proj + kv_resident", jax.jit(
            functools.partial(chain_headmajor, ps, n=n)), x)
        tm = timeit("token-major proj + pair_kv (round 5)", jax.jit(
            functools.partial(chain_tokenmajor, ps, n=n)), x)
        print(f"speedup {hm / tm:.3f}x")


if __name__ == "__main__":
    main()
