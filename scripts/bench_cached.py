#!/usr/bin/env python
"""Decompose the feature-cache train step (TODO 10b).

The cached step (train/segmenter.py:make_cached_train_step) measured 6.3 ms
(~2550 imgs/s/chip) at the ViT-S/8 res-224 batch-16 footprint, but ~1.3 ms of
that was suspected tunnel dispatch and the original ablation ladder ran in an
unhealthy tunnel window. This script re-runs the ladder with the bench.py
discipline (AOT compile, scalar-sync, best-of-N rounds, warm past the ~10
slow first executions) plus a dispatch-floor row (trivial jitted program on
the same input pytree) so on-device time separates from wire time.

Rows:
  dispatch floor      — jitted gather of one scalar from the same inputs
  gathers only        — feats/label takes + trivial reduction (no grads)
  - corr - CE - clu   — head fwd/bwd + Adam only
  - corr - CE         — + cluster probe
  - corr loss         — + probe CE (so this row minus previous = CE cost)
  full cached step    — + fused correlation loss (production variant)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

BATCH, RES, N_CACHE = 16, 224, 256
WARMUP, STEPS, ROUNDS = 15, 25, 3


def build_inputs(seg, key):
    hp = RES // seg.vit_cfg.patch_size
    kc = jax.random.fold_in(key, 9)
    cache = {
        "feats": jax.random.normal(
            kc, (N_CACHE, hp, hp, seg.vit_cfg.embed_dim), jnp.bfloat16),
        "label": jax.random.randint(
            jax.random.fold_in(kc, 1), (N_CACHE, RES, RES), -1, 27,
            jnp.int16),
    }
    cb = {
        "ind": jax.random.randint(jax.random.fold_in(kc, 2), (BATCH,), 0,
                                  N_CACHE, jnp.int32),
        "ind_pos": jax.random.randint(jax.random.fold_in(kc, 3), (BATCH,), 0,
                                      N_CACHE, jnp.int32),
    }
    return jax.device_put(cache), jax.device_put(cb)


def timeit(name, fn, *args, donate=()):
    jitted = jax.jit(fn, donate_argnums=donate)
    compiled = jitted.lower(*args).compile()
    sync = lambda o: float(o[1]["loss/total"])

    def call(state):
        out = compiled(*state)
        if donate:
            state = (state[0], out[0], *state[2:])
        return state, out

    t0 = time.perf_counter()
    state, out = call(args)
    sync(out)
    tc = time.perf_counter() - t0
    for i in range(WARMUP):
        state, out = call(state)
    sync(out)
    dt = float("inf")
    for r in range(ROUNDS):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, out = call(state)
        sync(out)
        dt = min(dt, (time.perf_counter() - t0) / STEPS)
    print(f"{name:44s} {dt*1e3:7.3f} ms/step  {BATCH/dt:7.1f} imgs/s"
          f"  (exec {tc:.1f}s first)", flush=True)
    return dt


def main():
    from stego_tpu.config import Config
    import stego_tpu.train.segmenter as seg_mod
    from stego_tpu.train.segmenter import (
        UnsupervisedSegmenter, make_cached_train_step)

    cfg = Config(model_type="vit_small", dino_patch_size=8, res=RES,
                 batch_size=BATCH, dataset_name="cocostuff27",
                 backbone_dtype="bfloat16")
    seg = UnsupervisedSegmenter(n_classes=27, cfg=cfg)
    key = jax.random.PRNGKey(0)
    cache, cb = build_inputs(seg, key)

    def fresh_state():  # donation kills the previous row's buffers
        return jax.device_put(seg.init_state(jax.random.fold_in(key, 1)))

    # dispatch floor: minimal program over the same input pytree
    def floor_fn(cache, state, batch, k):
        return (state,
                {"loss/total": jnp.float32(batch["ind"][0])
                 + cache["feats"][0, 0, 0, 0].astype(jnp.float32)})

    timeit("dispatch floor (trivial program)", floor_fn,
           cache, fresh_state(), cb, key)

    # gathers only: the two feature takes + label takes, summed
    def gathers_fn(cache, state, batch, k):
        f = jnp.take(cache["feats"], batch["ind"], axis=0)
        fp = jnp.take(cache["feats"], batch["ind_pos"], axis=0)
        l1 = jnp.take(cache["label"], batch["ind"], axis=0)
        l2 = jnp.take(cache["label"], batch["ind_pos"], axis=0)
        s = (jnp.sum(f, dtype=jnp.float32) + jnp.sum(fp, dtype=jnp.float32)
             + jnp.sum(l1, dtype=jnp.int32).astype(jnp.float32)
             + jnp.sum(l2, dtype=jnp.int32).astype(jnp.float32))
        return state, {"loss/total": s}

    timeit("gathers only", gathers_fn, cache, fresh_state(), cb, key)

    step = make_cached_train_step(seg, with_hist=False)
    timeit("full cached step", step, cache, fresh_state(), cb, key, donate=(1,))

    # ablations via monkeypatch
    orig_pair = seg_mod._corr_pair_losses

    def corr_stub(seg_, cfg_, key_, signal, signal_pos, code, code_pos,
                  sal, sal_pos, with_hist=True):
        z = jnp.zeros((), jnp.float32)
        return jnp.mean(code) + jnp.mean(code_pos), {
            "loss/pos_intra": z, "loss/pos_inter": z, "loss/neg_inter": z,
            "cd/pos_intra": z, "cd/pos_inter": z, "cd/neg_inter": z,
        }

    seg_mod._corr_pair_losses = corr_stub
    try:
        step2 = make_cached_train_step(seg, with_hist=False)
        timeit("- corr loss", step2, cache, fresh_state(), cb, key, donate=(1,))

        orig_ce = seg_mod.upsampled_masked_cross_entropy

        def ce_coderes(logits, labels, n_classes, compute_dtype=None):
            stride = labels.shape[1] // logits.shape[1]
            return orig_ce(logits, labels[:, ::stride, ::stride], n_classes,
                           compute_dtype=compute_dtype)

        seg_mod.upsampled_masked_cross_entropy = ce_coderes
        try:
            step3 = make_cached_train_step(seg, with_hist=False)
            timeit("- corr - CE upsample (CE at 28^2)", step3,
                   cache, fresh_state(), cb, key, donate=(1,))

            orig_cl = seg_mod.cluster_lookup

            def clu_stub(params, code, alpha=None):
                return jnp.mean(code) * 0.0, None

            seg_mod.cluster_lookup = clu_stub
            try:
                step4 = make_cached_train_step(seg, with_hist=False)
                timeit("- corr - CE - cluster (head+linear+Adam)", step4,
                       cache, fresh_state(), cb, key, donate=(1,))
            finally:
                seg_mod.cluster_lookup = orig_cl
        finally:
            seg_mod.upsampled_masked_cross_entropy = orig_ce
    finally:
        seg_mod._corr_pair_losses = orig_pair


if __name__ == "__main__":
    main()
