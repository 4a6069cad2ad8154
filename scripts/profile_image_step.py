#!/usr/bin/env python
"""Profile the ViT-S image train step (VERDICT r3 #9 receipt).

The round-3d profile charged ~19% of the batch-8 step to synchronous layout
copies (the packed-qkv unpack relayouts). Round 4's token-major pair
attention kernel removed the head-major relayout entirely — this script
re-captures the trace at the bench footprint so the receipt reflects the
current dispatch. Analyze with scripts/profile_report.py (spans are
in-flight, not exclusive — use for relative structure).

Usage: python scripts/profile_image_step.py [outdir=/tmp/prof_image] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

RES = 224
MODEL = os.environ.get("STEGO_BENCH_MODEL", "vit_small")
WARMUP, STEPS = 15, 25


def main():
    outdir = "/tmp/prof_image"
    batch = 16
    for a in sys.argv[1:]:
        if a.isdigit():
            batch = int(a)
        else:
            outdir = a

    from stego_tpu.config import Config
    from stego_tpu.models.vit import init_vit_params
    from stego_tpu.train.segmenter import (UnsupervisedSegmenter,
                                           make_train_step)

    cfg = Config(model_type=MODEL, dino_patch_size=8, res=RES,
                 batch_size=batch, dataset_name="cocostuff27",
                 backbone_dtype="bfloat16")
    from stego_tpu.models.vit import cast_params_for_compute

    seg = UnsupervisedSegmenter(n_classes=27, cfg=cfg)
    key = jax.random.PRNGKey(0)
    backbone = jax.device_put(cast_params_for_compute(
        init_vit_params(key, seg.vit_cfg), jnp.bfloat16))
    state = jax.device_put(seg.init_state(jax.random.fold_in(key, 1)))
    kb = jax.random.fold_in(key, 3)
    batch_d = {
        "img": jax.device_put(jax.random.normal(
            jax.random.fold_in(kb, 0), (batch, RES, RES, 3), jnp.float32)),
        "img_pos": jax.device_put(jax.random.normal(
            jax.random.fold_in(kb, 1), (batch, RES, RES, 3), jnp.float32)),
        "label": jax.device_put(jax.random.randint(
            jax.random.fold_in(kb, 2), (batch, RES, RES), -1, 27)),
        "label_pos": jax.device_put(jax.random.randint(
            jax.random.fold_in(kb, 3), (batch, RES, RES), -1, 27)),
    }

    jitted = jax.jit(make_train_step(seg, with_hist=False),
                     donate_argnums=(1,))
    t0 = time.perf_counter()
    compiled = jitted.lower(backbone, state, batch_d, key).compile()
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)

    def run(st):
        st, m = compiled(backbone, st, batch_d, key)
        return st, m

    state, m = run(state)
    float(m["loss/total"])
    for _ in range(WARMUP):
        state, m = run(state)
    float(m["loss/total"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, m = run(state)
        float(m["loss/total"])
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f"{MODEL} image step b={batch}: {best*1e3:.2f} ms/step "
          f"{batch/best:.0f} imgs/s", flush=True)

    jax.profiler.start_trace(outdir)
    for _ in range(8):
        state, m = run(state)
    float(m["loss/total"])
    jax.profiler.stop_trace()
    print(f"trace -> {outdir}", flush=True)


if __name__ == "__main__":
    main()
