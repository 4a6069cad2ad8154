#!/usr/bin/env python
"""On-hardware parity + throughput check for the Pallas kernels.

The pytest suite runs kernels in interpreter mode on CPU; this script runs the
COMPILED kernels on the real chip and compares against the einsum oracles,
then reports steady-state timings (multi-round — the remote platform runs the
first ~10 executions of any program slow; see CLAUDE.md).

Usage: python scripts/tpu_parity_check.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np


def check(name, got, want, rtol=2e-4, atol=1e-5):
    got, want = np.asarray(got), np.asarray(want)
    ok = np.allclose(got, want, rtol=rtol, atol=atol)
    md = float(np.abs(got - want).max()) if got.shape == want.shape else "shape!"
    print(f"  {'OK ' if ok else 'FAIL'} {name}: maxdiff={md}")
    return ok


def steady_ms(f, *args, iters=10, rounds=3):
    r = f(*args)
    _ = float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
    best = float("inf")
    for _rnd in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*args)
        _ = float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters * 1000)
    return best


def main():
    ok = True
    print(f"devices: {jax.devices()}")

    # --- fused correlation loss vs einsum oracle (compiled) ---
    from stego_tpu.ops.correlation import CorrLossCfg, corr_loss_helper
    from stego_tpu.ops.pallas_corr import fused_correlation_loss

    k = jr.PRNGKey(0)
    b, h, w, cf, cc = 4, 11, 11, 384, 70
    f1 = jr.normal(jr.fold_in(k, 1), (b, h, w, cf))
    f2 = jr.normal(jr.fold_in(k, 2), (b, h, w, cf))
    c1 = jr.normal(jr.fold_in(k, 3), (b, h, w, cc))
    c2 = jr.normal(jr.fold_in(k, 4), (b, h, w, cc))
    cfg = CorrLossCfg()

    def oracle(c1, c2):
        loss, cd = corr_loss_helper(f1, f2, c1, c2, 0.12, cfg)
        return jnp.mean(loss), jnp.mean(cd)

    def fused(c1, c2):
        return fused_correlation_loss(f1, f2, c1, c2, 0.12, interpret=False)

    print("fused correlation loss (compiled):")
    lo, cdo = jax.jit(oracle)(c1, c2)
    lf, cdf = jax.jit(fused)(c1, c2)
    ok &= check("fwd loss", lf, lo, rtol=1e-4)
    ok &= check("fwd cd", cdf, cdo, rtol=1e-4)
    go = jax.jit(jax.grad(lambda a, b: oracle(a, b)[0], argnums=(0, 1)))(c1, c2)
    gf = jax.jit(jax.grad(lambda a, b: fused(a, b)[0], argnums=(0, 1)))(c1, c2)
    ok &= check("grad dc1", gf[0], go[0])
    ok &= check("grad dc2", gf[1], go[1])

    # full-field timing at flagship shapes
    b2 = 16
    F1 = jr.normal(jr.fold_in(k, 5), (b2, 28, 28, 384))
    C1 = jr.normal(jr.fold_in(k, 7), (b2, 28, 28, 70))
    g_full = jax.jit(jax.grad(
        lambda c: fused_correlation_loss(F1, F1, c, c, 0.12,
                                         interpret=False)[0]))
    print(f"  full-field 16x(784x784) fwd+bwd: {steady_ms(g_full, C1):.1f} ms")

    # --- attention kernels vs standard ---
    from stego_tpu.ops.flash_attention import flash_attention, resident_attention

    bh, hh, n, d = 8, 6, 785, 64
    q = jr.normal(jr.fold_in(k, 8), (bh, hh, n, d), jnp.bfloat16)
    kk = jr.normal(jr.fold_in(k, 9), (bh, hh, n, d), jnp.bfloat16)
    v = jr.normal(jr.fold_in(k, 10), (bh, hh, n, d), jnp.bfloat16)
    scale = d**-0.5

    def standard(q, kk, v):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, kk,
                            preferred_element_type=jnp.float32) * scale
        return jnp.einsum("bhqk,bhkd->bhqd",
                          jax.nn.softmax(logits, -1).astype(v.dtype), v)

    print("attention kernels (compiled):")
    fs = jax.jit(standard)
    fr = jax.jit(lambda q, kk, v: resident_attention(q, kk, v, scale))
    ff = jax.jit(lambda q, kk, v: flash_attention(q, kk, v, scale))
    want = fs(q, kk, v)
    ok &= check("resident", fr(q, kk, v).astype(jnp.float32),
                want.astype(jnp.float32), rtol=2e-2, atol=5e-3)
    ok &= check("flash", ff(q, kk, v).astype(jnp.float32),
                want.astype(jnp.float32), rtol=2e-2, atol=5e-3)
    print(f"  standard: {steady_ms(fs, q, kk, v):.2f} ms, "
          f"resident: {steady_ms(fr, q, kk, v):.2f} ms, "
          f"flash: {steady_ms(ff, q, kk, v):.2f} ms")

    print("ALL OK" if ok else "FAILURES PRESENT")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
