#!/usr/bin/env python
"""Full train-step variant timing (ViT-S/8, res 224, batch 16, 1 chip).

Variants: flash-attention trunk, histogram removal, bf16 linear-probe logit
upsampling — measured cumulatively to find the winning production config.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BATCH, RES = 16, 224
WARMUP, STEPS = 14, 25


def build(cfg_kw):
    from stego_tpu.config import Config
    from stego_tpu.models.vit import init_vit_params
    from stego_tpu.train.segmenter import UnsupervisedSegmenter, make_train_step

    cfg = Config(model_type="vit_small", dino_patch_size=8, res=RES,
                 batch_size=BATCH, dataset_name="cocostuff27",
                 backbone_dtype="bfloat16", **cfg_kw)
    seg = UnsupervisedSegmenter(n_classes=27, cfg=cfg)
    key = jax.random.PRNGKey(0)
    backbone = jax.device_put(init_vit_params(key, seg.vit_cfg))
    state = jax.device_put(seg.init_state(jax.random.fold_in(key, 1)))
    batch = {
        "img": jax.random.normal(jax.random.fold_in(key, 2),
                                 (BATCH, RES, RES, 3), jnp.float32),
        "img_pos": jax.random.normal(jax.random.fold_in(key, 3),
                                     (BATCH, RES, RES, 3), jnp.float32),
        "label": jax.random.randint(jax.random.fold_in(key, 4),
                                    (BATCH, RES, RES), -1, 27),
        "label_pos": jax.random.randint(jax.random.fold_in(key, 5),
                                        (BATCH, RES, RES), -1, 27),
    }
    batch = jax.device_put(batch)
    step = jax.jit(make_train_step(seg))
    return step, backbone, state, batch


def timeit(name, cfg_kw):
    key = jax.random.PRNGKey(9)
    step, backbone, state, batch = build(cfg_kw)
    t0c = time.perf_counter()
    state2, m = step(backbone, state, batch, key)
    float(m["loss/total"])
    tc = time.perf_counter() - t0c
    for i in range(WARMUP):
        state2, m = step(backbone, state2, batch, jax.random.fold_in(key, i))
    float(m["loss/total"])
    t0 = time.perf_counter()
    for i in range(STEPS):
        state2, m = step(backbone, state2, batch,
                         jax.random.fold_in(key, 100 + i))
    float(m["loss/total"])
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:46s} {dt*1e3:7.2f} ms/step  {BATCH/dt:6.1f} imgs/s"
          f"  (compile {tc:.0f}s)", flush=True)
    return dt


def main():
    import stego_tpu.train.segmenter as seg_mod

    timeit("default (scan einsum trunk)", {"use_flash_attention": False})
    timeit("+ flash trunk", {})

    # histograms off
    orig_corr = seg_mod._corr_pair_losses

    def corr_no_hist(*a, **k):
        loss, metrics = orig_corr(*a, **k)
        metrics = {k2: v for k2, v in metrics.items()
                   if not k2.startswith("hist/")}
        return loss, metrics

    seg_mod._corr_pair_losses = corr_no_hist
    try:
        timeit("+ no cd histograms", {})
    finally:
        seg_mod._corr_pair_losses = orig_corr

    # bf16 linear-probe upsample
    orig_interp = seg_mod.interpolate

    def bf16_interp(x, size, *a, **k):
        return orig_interp(x.astype(jnp.bfloat16), size, *a, **k)

    seg_mod._corr_pair_losses = corr_no_hist
    seg_mod.interpolate = bf16_interp
    try:
        timeit("+ no hists + bf16 probe upsample", {})
    finally:
        seg_mod._corr_pair_losses = orig_corr
        seg_mod.interpolate = orig_interp


if __name__ == "__main__":
    main()
