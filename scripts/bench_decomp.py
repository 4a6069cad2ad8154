#!/usr/bin/env python
"""Decompose the 39 ms train step (ViT-S/8, res 224, batch 16, 1 chip).

Ablation ladder (each variant monkeypatches one more component away) to find
where the non-trunk time goes: cd histograms, the 224^2 linear-probe CE chain,
probe losses entirely, and the img_pos half of the trunk. Compare with the
bare trunk-forward number from scripts/bench_block.py (~21.5 ms for b=32).
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


def timeit(name, cfg_kw=None):
    key = jax.random.PRNGKey(9)
    step, backbone, state, batch = build(cfg_kw or {})
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
    print(f"{name:52s} {dt*1e3:7.2f} ms/step  {BATCH/dt:6.1f} imgs/s"
          f"  (compile {tc:.0f}s)", flush=True)
    return dt


def main():
    import stego_tpu.train.segmenter as seg_mod

    timeit("default (flash trunk, hists, 224^2 CE)")

    # 1) histograms off
    orig_corr = seg_mod._corr_pair_losses

    def corr_no_hist(*a, **k):
        loss, metrics = orig_corr(*a, **k)
        metrics = {k2: v for k2, v in metrics.items()
                   if not k2.startswith("hist/")}
        return loss, metrics

    seg_mod._corr_pair_losses = corr_no_hist
    try:
        timeit("- cd histograms")

        # 2) + CE at code res (no 224^2 upsample chain)
        orig_interp = seg_mod.interpolate
        orig_ce = seg_mod.masked_cross_entropy

        def interp_identity(x, size, *a, **k):
            return x

        def ce_coderes(logits, labels, n_classes):
            stride = labels.shape[1] // logits.shape[1]
            return orig_ce(logits, labels[:, ::stride, ::stride], n_classes)

        seg_mod.interpolate = interp_identity
        seg_mod.masked_cross_entropy = ce_coderes
        try:
            timeit("- hists - CE upsample (CE at 28^2)")
        finally:
            seg_mod.interpolate = orig_interp
            seg_mod.masked_cross_entropy = orig_ce

        # 3) + correlation loss replaced by plain mean of code (keeps both
        # trunk forwards and the head, removes sampling + fused kernel)
        orig_pair = seg_mod._corr_pair_losses

        def corr_stub(seg, cfg, key, signal, signal_pos, code, code_pos,
                      sal, sal_pos):
            z = jnp.zeros((), jnp.float32)
            return jnp.mean(code) + jnp.mean(code_pos), {
                "loss/pos_intra": z, "loss/pos_inter": z, "loss/neg_inter": z,
                "cd/pos_intra": z, "cd/pos_inter": z, "cd/neg_inter": z,
            }

        seg_mod._corr_pair_losses = corr_stub
        try:
            timeit("- hists - corr loss (trunk pair + head + probes)")
        finally:
            seg_mod._corr_pair_losses = corr_no_hist
    finally:
        seg_mod._corr_pair_losses = orig_corr

    # 4) no img_pos forward at all (half the trunk work; also drops corr loss)
    timeit("correspondence_weight=0 (single-image trunk)",
           {"correspondence_weight": 0.0})


if __name__ == "__main__":
    main()
