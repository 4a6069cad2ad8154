#!/usr/bin/env python
"""Eval-step flip-TTA formulation timing (ViT-S/8, batch 8, 1 chip).

Production (stego_tpu/eval/evaluate.py:make_eval_step) runs flip-TTA as TWO
backbone calls inside one jitted program; this script keeps the
concat-into-one-batched-call alternative inline as the comparison.

Measured on v5e (2026-08-17, min of 3 rounds x 20 steps):
    res 320: two-call 28.5 ms  vs  batched 33.6 ms  (batched 0.85x)
    res 224: two-call  9.8 ms  vs  batched 10.8 ms  (batched 0.91x)
Both variants are ONE XLA program (no per-call dispatch overhead exists to
save); two independent half-batch chains schedule better than one doubled
chain, so the two-call form is the production one.

Round-5 re-measure (2026-08-19, after the token-major kv-resident pair
kernel took res-320 attention off the head-major projections —
scripts/bench_attn_longn.py: 12-sublayer chain 21.3 -> 15.6 ms):
    res 320: two-call 24.3 ms  vs  batched 23.6 ms  (batched 1.03x)
    res 224: two-call  9.1 ms  vs  batched  8.9 ms  (batched 1.02x)
The scheduling trade flipped to a ~2-3% batched edge once the relayouts
left the chain; kept two-call — within remeasurement noise and the
two-call form is what the sharded eval path (process-sharded batches)
composes with.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BATCH = 8
WARMUP, STEPS, ROUNDS = 12, 20, 3


def run(res: int):
    from stego_tpu.config import Config
    from stego_tpu.eval.evaluate import make_eval_step
    from stego_tpu.models.probes import linear_probe_logits
    from stego_tpu.models.vit import init_vit_params
    from stego_tpu.ops.math import l2_normalize
    from stego_tpu.ops.probe_ce import upsampled_argmax
    from stego_tpu.train.segmenter import UnsupervisedSegmenter

    cfg = Config(model_type="vit_small", dino_patch_size=8, res=res,
                 dataset_name="cocostuff27", backbone_dtype="bfloat16")
    seg = UnsupervisedSegmenter(n_classes=27, cfg=cfg)
    key = jax.random.PRNGKey(0)
    backbone = jax.device_put(init_vit_params(key, seg.vit_cfg))
    params = jax.device_put(seg.init_params(jax.random.fold_in(key, 1)))
    img = jax.device_put(jax.random.normal(
        jax.random.fold_in(key, 2), (BATCH, res, res, 3), jnp.float32))
    label = jax.device_put(jax.random.randint(
        jax.random.fold_in(key, 3), (BATCH, res, res), -1, 27))

    def batched_step(backbone, params, img, label):
        """Alternative: one doubled-batch backbone call."""
        b = img.shape[0]
        both = jnp.concatenate([img, img[:, :, ::-1]], axis=0)
        _, code_both = seg.net.apply(backbone, params["head"], both,
                                     train=False)
        code = (code_both[:b] + code_both[b:, :, ::-1]) / 2.0
        hw = label.shape[1:3]
        lp = upsampled_argmax(
            linear_probe_logits(params["linear_probe"], code), hw)
        cp = upsampled_argmax(
            code @ l2_normalize(params["cluster_probe"]["clusters"],
                                axis=1).T, hw)
        return lp, cp

    production = jax.jit(make_eval_step(seg, run_crf=False))
    batched = jax.jit(batched_step)

    def timeit(name, fn):
        for _ in range(WARMUP):
            lp, cp = fn(backbone, params, img, label)
        float(jnp.sum(cp))
        best = float("inf")
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            for _ in range(STEPS):
                lp, cp = fn(backbone, params, img, label)
            float(jnp.sum(cp))
            best = min(best, (time.perf_counter() - t0) / STEPS)
        print(f"res{res} {name}: {best * 1e3:.2f} ms/step "
              f"({BATCH / best:.1f} imgs/s)")
        return best

    t_prod = timeit("two-call (production)", production)
    t_bat = timeit("concat-batched       ", batched)
    print(f"res{res} batched vs production: {t_prod / t_bat:.3f}x")


if __name__ == "__main__":
    for res in (320, 224):
        run(res)
