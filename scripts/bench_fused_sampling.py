#!/usr/bin/env python
"""A/B the cached train step: round-3 matmul sampler vs round-4 fused kernel.

Times make_cached_train_step (single dispatch) and make_cached_multi_step
(K=16, one dispatch) with fused_sampling on/off at the production footprint
(ViT-S/8 res-224 batch-16 feature cache). Also reports compile times — the
fused kernel has a 112-step grid and runs inside the K-step lax.scan, so the
Pallas-in-scan compile-time trap (CLAUDE.md) needs a measured receipt.

Usage: python scripts/bench_fused_sampling.py [K ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BATCH, RES, N_CACHE = 16, 224, 256
WARMUP, STEPS, ROUNDS = 12, 25, 3


def health_probe():
    x = jax.device_put(jnp.ones((2048, 2048), jnp.bfloat16))
    f = jax.jit(lambda a: a @ a)
    float(jnp.sum(f(x), dtype=jnp.float32))
    t0 = time.perf_counter()
    float(jnp.sum(f(x), dtype=jnp.float32))
    t_mm = time.perf_counter() - t0
    big = jax.device_put(jnp.zeros((8 * 1024 * 1024,), jnp.float32))
    t0 = time.perf_counter()
    jax.device_get(big)
    mbps = 32 / (time.perf_counter() - t0)
    print(f"health: matmul+fetch {t_mm*1e3:.1f} ms, device_get "
          f"{mbps:.1f} MB/s", flush=True)


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 16]
    health_probe()

    from stego_tpu.config import Config
    from stego_tpu.train.segmenter import (
        UnsupervisedSegmenter, make_cached_train_step,
        make_cached_multi_step)
    from scripts.bench_cached import build_inputs

    key = jax.random.PRNGKey(0)

    for fused in ("off", "auto"):
        cfg = Config(model_type="vit_small", dino_patch_size=8, res=RES,
                     batch_size=BATCH, dataset_name="cocostuff27",
                     backbone_dtype="bfloat16", fused_sampling=fused)
        seg = UnsupervisedSegmenter(n_classes=27, cfg=cfg)
        cache, cb = build_inputs(seg, key)
        for k_steps in ks:
            state = jax.device_put(seg.init_state(jax.random.fold_in(key, 1)))
            if k_steps == 1:
                step = make_cached_train_step(seg, with_hist=False)
                args0 = (cache, state, cb, key)
                jitted = jax.jit(step, donate_argnums=(1,))
            else:
                sched = jax.device_put({
                    "ind": jax.random.randint(
                        jax.random.fold_in(key, 5), (k_steps, BATCH), 0,
                        N_CACHE, jnp.int32),
                    "ind_pos": jax.random.randint(
                        jax.random.fold_in(key, 6), (k_steps, BATCH), 0,
                        N_CACHE, jnp.int32),
                })
                step = make_cached_multi_step(seg, k_steps, with_hist=False)
                args0 = (cache, state, sched, key, jnp.int32(0), jnp.int32(0))
                jitted = jax.jit(step, donate_argnums=(1,))
            t0 = time.perf_counter()
            compiled = jitted.lower(*args0).compile()
            tcomp = time.perf_counter() - t0

            def sync(out):
                m = out[1]["loss/total"]
                return float(m[-1] if m.ndim else m)

            def run(st):
                out = compiled(*((args0[0], st) + args0[2:]))
                return out[0], out

            st, out = run(state)
            sync(out)
            for _ in range(WARMUP):
                st, out = run(st)
            sync(out)
            best = float("inf")
            for _ in range(ROUNDS):
                t0 = time.perf_counter()
                for _ in range(STEPS):
                    st, out = run(st)
                sync(out)
                best = min(best, (time.perf_counter() - t0)
                           / (STEPS * k_steps))
            print(f"fused={fused:4s} K={k_steps:3d}: {best*1e3:7.3f} ms/step"
                  f"  {BATCH/best:7.1f} imgs/s  (compile {tcomp:.1f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
