#!/usr/bin/env python
"""Profile the K=16 cached multi-step: where do the ~2.2 ms/step go?

Round-4 follow-up to scripts/bench_cached.py (which gave the coarse ladder:
corr ~1.4 ms, CE ~0.2, cluster ~0.3, head+Adam+gathers ~0.5). This captures
an xplane trace of the production `make_cached_multi_step` program so the
corr loss's internal structure (sampling matmuls vs weight-matrix build vs
normalize/pad elementwise vs the Pallas kernel vs the perm-gather backward)
is visible. Analyze with scripts/profile_report.py (remember: spans are
in-flight, not exclusive — use for relative structure only).

Usage: python scripts/profile_cached.py [outdir=/tmp/prof_cached]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BATCH, RES, N_CACHE, K = 16, 224, 256, 16
WARMUP_WINDOWS, TIMED_WINDOWS = 8, 12


def health_probe():
    """Small matmul + ~32 MB device_get: is the tunnel in a healthy window?"""
    x = jax.device_put(jnp.ones((2048, 2048), jnp.bfloat16))
    f = jax.jit(lambda a: a @ a)
    float(jnp.sum(f(x), dtype=jnp.float32))  # compile+warm
    t0 = time.perf_counter()
    float(jnp.sum(f(x), dtype=jnp.float32))
    t_mm = time.perf_counter() - t0
    big = jax.device_put(jnp.zeros((8 * 1024 * 1024,), jnp.float32))
    t0 = time.perf_counter()
    jax.device_get(big)
    t_get = time.perf_counter() - t0
    mbps = 32 / t_get
    print(f"health: matmul+fetch {t_mm*1e3:.1f} ms, device_get {mbps:.1f} "
          f"MB/s", flush=True)
    return t_mm < 0.5 and mbps > 5


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_cached"
    if not health_probe():
        print("TUNNEL UNHEALTHY — numbers below are unreliable", flush=True)

    from stego_tpu.config import Config
    from stego_tpu.train.segmenter import (
        UnsupervisedSegmenter, make_cached_multi_step)
    from scripts.bench_cached import build_inputs

    cfg = Config(model_type="vit_small", dino_patch_size=8, res=RES,
                 batch_size=BATCH, dataset_name="cocostuff27",
                 backbone_dtype="bfloat16")
    seg = UnsupervisedSegmenter(n_classes=27, cfg=cfg)
    key = jax.random.PRNGKey(0)
    cache, cb = build_inputs(seg, key)
    # (K, B) stacked index schedule
    sched = {
        "ind": jax.random.randint(jax.random.fold_in(key, 5), (K, BATCH), 0,
                                  N_CACHE, jnp.int32),
        "ind_pos": jax.random.randint(jax.random.fold_in(key, 6), (K, BATCH),
                                      0, N_CACHE, jnp.int32),
    }
    sched = jax.device_put(sched)
    state = jax.device_put(seg.init_state(jax.random.fold_in(key, 1)))

    multi = make_cached_multi_step(seg, K, with_hist=False)
    jitted = jax.jit(multi, donate_argnums=(1,),
                     static_argnames=())
    t0 = time.perf_counter()
    compiled = jitted.lower(cache, state, sched, key, jnp.int32(0),
                            jnp.int32(0)).compile()
    print(f"compile {time.perf_counter()-t0:.1f} s", flush=True)

    def run(state):
        st, ms = compiled(cache, state, sched, key, jnp.int32(0),
                          jnp.int32(0))
        return st, ms

    state, ms = run(state)
    float(ms["loss/total"][-1])
    for _ in range(WARMUP_WINDOWS):
        state, ms = run(state)
    float(ms["loss/total"][-1])

    # steady-state timing (3 rounds, best)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(TIMED_WINDOWS):
            state, ms = run(state)
        float(ms["loss/total"][-1])
        dt = (time.perf_counter() - t0) / (TIMED_WINDOWS * K)
        best = min(best, dt)
    print(f"cached K={K}: {best*1e3:.3f} ms/step  "
          f"{BATCH/best:.0f} imgs/s", flush=True)

    jax.profiler.start_trace(outdir)
    for _ in range(4):
        state, ms = run(state)
    float(ms["loss/total"][-1])
    jax.profiler.stop_trace()
    print(f"trace -> {outdir}", flush=True)


if __name__ == "__main__":
    main()
