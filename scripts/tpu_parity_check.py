#!/usr/bin/env python
"""On-hardware parity + throughput check for the Pallas kernels.

The pytest suite runs kernels in interpreter mode on CPU; this script runs the
COMPILED (Mosaic) kernels on the real chip and compares against the einsum
oracles, then reports steady-state timings (multi-round — the remote platform
runs the first ~10 executions of any program slow; see CLAUDE.md).

A Mosaic-compile regression would otherwise surface only as silent accuracy
drift (round-3 VERDICT weak #5) — run this every round and commit the JSON:

Usage: python scripts/tpu_parity_check.py [json=PARITY_rNN.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

RESULTS = []


def check(name, got, want, rtol=2e-4, atol=1e-5):
    got, want = np.asarray(got), np.asarray(want)
    shape_ok = got.shape == want.shape
    md = float(np.abs(got - want).max()) if shape_ok else float("nan")
    ok = shape_ok and np.allclose(got, want, rtol=rtol, atol=atol)
    print(f"  {'OK ' if ok else 'FAIL'} {name}: maxdiff={md}")
    RESULTS.append({"kernel": name, "maxdiff": md, "rtol": rtol,
                    "atol": atol, "ok": bool(ok)})
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


def record_ms(name, ms):
    RESULTS.append({"timing": name, "steady_ms": round(ms, 3)})
    return ms


def main():
    ok = True
    json_path = None
    for a in sys.argv[1:]:
        if a.startswith("json="):
            json_path = a.split("=", 1)[1]
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
    ok &= check("corr fwd loss", lf, lo, rtol=1e-4)
    ok &= check("corr fwd cd", cdf, cdo, rtol=1e-4)
    go = jax.jit(jax.grad(lambda a, b: oracle(a, b)[0], argnums=(0, 1)))(c1, c2)
    gf = jax.jit(jax.grad(lambda a, b: fused(a, b)[0], argnums=(0, 1)))(c1, c2)
    ok &= check("corr grad dc1", gf[0], go[0])
    ok &= check("corr grad dc2", gf[1], go[1])

    # full-field timing at flagship shapes
    b2 = 16
    F1 = jr.normal(jr.fold_in(k, 5), (b2, 28, 28, 384))
    C1 = jr.normal(jr.fold_in(k, 7), (b2, 28, 28, 70))
    g_full = jax.jit(jax.grad(
        lambda c: fused_correlation_loss(F1, F1, c, c, 0.12,
                                         interpret=False)[0]))
    ms = record_ms("full-field 16x(784x784) fwd+bwd", steady_ms(g_full, C1))
    print(f"  full-field 16x(784x784) fwd+bwd: {ms:.1f} ms")

    # --- fused in-kernel-sampling correlation loss (round 4) ---
    from stego_tpu.ops.pallas_corr import contrastive_correlation_loss_fused

    k5 = jr.fold_in(k, 30)
    bs, hs, ws = 16, 28, 28
    sf1 = jr.normal(jr.fold_in(k5, 1), (bs, hs, ws, 384), jnp.bfloat16)
    sf2 = jr.normal(jr.fold_in(k5, 2), (bs, hs, ws, 384), jnp.bfloat16)
    sc1 = jr.normal(jr.fold_in(k5, 3), (bs, hs, ws, 70))
    sc2 = jr.normal(jr.fold_in(k5, 4), (bs, hs, ws, 70))
    scfg = CorrLossCfg()
    skey = jr.fold_in(k5, 5)

    def sampled(impl, c1, c2):
        out = contrastive_correlation_loss_fused(
            scfg, skey, sf1, sf2, c1, c2, interpret=False,
            sampling_impl=impl, feat_dtype=jnp.bfloat16)
        return (out["pos_intra_loss"] + out["pos_inter_loss"]
                + out["neg_inter_loss"])

    print("fused in-kernel sampling (compiled):")
    f_mm = jax.jit(lambda c1, c2: sampled("matmul", c1, c2))
    f_fu = jax.jit(lambda c1, c2: sampled("fused", c1, c2))
    ok &= check("sampled-fused fwd loss", f_fu(sc1, sc2), f_mm(sc1, sc2),
                rtol=1e-4, atol=1e-6)
    g_mm = jax.jit(jax.grad(lambda a, b: sampled("matmul", a, b),
                            argnums=(0, 1)))(sc1, sc2)
    g_fu = jax.jit(jax.grad(lambda a, b: sampled("fused", a, b),
                            argnums=(0, 1)))(sc1, sc2)
    ok &= check("sampled-fused grad dcode", g_fu[0], g_mm[0])
    ok &= check("sampled-fused grad dcode_pos", g_fu[1], g_mm[1])

    # --- attention kernels vs standard ---
    from stego_tpu.ops.flash_attention import (
        batch_resident_attention,
        flash_attention,
        kv_resident_attention,
        resident_attention,
    )

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
    fb = jax.jit(lambda q, kk, v: batch_resident_attention(q, kk, v, scale))
    want = fs(q, kk, v)
    ok &= check("attn resident", fr(q, kk, v).astype(jnp.float32),
                want.astype(jnp.float32), rtol=2e-2, atol=5e-3)
    ok &= check("attn flash", ff(q, kk, v).astype(jnp.float32),
                want.astype(jnp.float32), rtol=2e-2, atol=5e-3)
    ok &= check("attn batch-resident (ViT-S all-heads)",
                fb(q, kk, v).astype(jnp.float32),
                want.astype(jnp.float32), rtol=2e-2, atol=5e-3)
    print(f"  standard: {record_ms('attn standard', steady_ms(fs, q, kk, v)):.2f} ms, "
          f"resident: {record_ms('attn resident', steady_ms(fr, q, kk, v)):.2f} ms, "
          f"flash: {record_ms('attn flash', steady_ms(ff, q, kk, v)):.2f} ms, "
          f"batch-resident: {record_ms('attn batch-resident', steady_ms(fb, q, kk, v)):.2f} ms")

    # token-major pair kernel (round-4 trunk dispatch for d=64, even heads)
    from stego_tpu.ops.flash_attention import pair_attention

    qt = q.transpose(0, 2, 1, 3).reshape(bh, n, hh * d)
    kt = kk.transpose(0, 2, 1, 3).reshape(bh, n, hh * d)
    vt = v.transpose(0, 2, 1, 3).reshape(bh, n, hh * d)
    fp = jax.jit(lambda a, b, c: pair_attention(a, b, c, hh, scale))
    ok &= check("attn pair token-major",
                fp(qt, kt, vt).astype(jnp.float32),
                want.transpose(0, 2, 1, 3).reshape(bh, n, hh * d)
                .astype(jnp.float32), rtol=2e-2, atol=5e-3)
    print(f"  pair token-major: {record_ms('attn pair', steady_ms(fp, qt, kt, vt)):.2f} ms")

    # ViT-B head-sliced dispatch (12 heads, heads_per_step from the VMEM fit)
    qb = jr.normal(jr.fold_in(k, 20), (4, 12, n, d), jnp.bfloat16)
    kb = jr.normal(jr.fold_in(k, 21), (4, 12, n, d), jnp.bfloat16)
    vb = jr.normal(jr.fold_in(k, 22), (4, 12, n, d), jnp.bfloat16)
    from stego_tpu.ops.flash_attention import trunk_attention

    ft = jax.jit(lambda q, kk, v: trunk_attention(q, kk, v, scale))
    ok &= check("attn trunk-dispatch (ViT-B h=12)",
                ft(qb, kb, vb).astype(jnp.float32),
                fs(qb, kb, vb).astype(jnp.float32), rtol=2e-2, atol=5e-3)

    # kv-resident long-sequence kernel (res-448 regime, N=3137)
    nl = 3137
    ql = jr.normal(jr.fold_in(k, 23), (2, 6, nl, d), jnp.bfloat16)
    kl = jr.normal(jr.fold_in(k, 24), (2, 6, nl, d), jnp.bfloat16)
    vl = jr.normal(jr.fold_in(k, 25), (2, 6, nl, d), jnp.bfloat16)
    fkv = jax.jit(lambda q, kk, v: kv_resident_attention(q, kk, v, scale))
    ok &= check("attn kv-resident (N=3137)",
                fkv(ql, kl, vl).astype(jnp.float32),
                fs(ql, kl, vl).astype(jnp.float32), rtol=2e-2, atol=5e-3)
    print(f"  kv-resident N=3137: {record_ms('attn kv-resident N=3137', steady_ms(fkv, ql, kl, vl)):.2f} ms")

    # token-major kv-resident PAIR kernel (round-5 res-320/448 dispatch)
    from stego_tpu.ops.flash_attention import pair_kv_attention

    qlt = ql.transpose(0, 2, 1, 3).reshape(2, nl, 6 * d)
    klt = kl.transpose(0, 2, 1, 3).reshape(2, nl, 6 * d)
    vlt = vl.transpose(0, 2, 1, 3).reshape(2, nl, 6 * d)
    fpkv = jax.jit(lambda a, b, c: pair_kv_attention(a, b, c, 6, scale))
    ok &= check(
        "attn pair-kv token-major (N=3137)",
        fpkv(qlt, klt, vlt).astype(jnp.float32),
        fs(ql, kl, vl).transpose(0, 2, 1, 3).reshape(2, nl, 6 * d)
        .astype(jnp.float32), rtol=2e-2, atol=5e-3)
    print(f"  pair-kv N=3137: {record_ms('attn pair-kv N=3137', steady_ms(fpkv, qlt, klt, vlt)):.2f} ms")

    # --- fused layernorm vs XLA form ---
    from stego_tpu.ops.layer_norm import fused_layer_norm

    xln = jr.normal(jr.fold_in(k, 26), (32, 785, 384), jnp.bfloat16)
    sc = jr.normal(jr.fold_in(k, 27), (384,), jnp.float32)
    bi = jr.normal(jr.fold_in(k, 28), (384,), jnp.float32)

    def ln_ref(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * sc + bi).astype(x.dtype)

    fl = jax.jit(lambda x: fused_layer_norm(x, sc, bi, 1e-6))
    flr = jax.jit(ln_ref)
    print("fused layernorm (compiled):")
    ok &= check("layernorm (bit-parity target)",
                fl(xln).astype(jnp.float32), flr(xln).astype(jnp.float32),
                rtol=0.0, atol=0.0)
    print(f"  xla: {record_ms('layernorm xla', steady_ms(flr, xln)):.3f} ms, "
          f"pallas: {record_ms('layernorm pallas', steady_ms(fl, xln)):.3f} ms")

    if json_path:
        with open(json_path, "w") as fjson:
            json.dump({"device": str(jax.devices()[0]),
                       "all_ok": bool(ok), "results": RESULTS}, fjson,
                      indent=1)
        print(f"wrote {json_path}")
    print("ALL OK" if ok else "FAILURES PRESENT")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
