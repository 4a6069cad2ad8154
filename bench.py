#!/usr/bin/env python
"""Benchmark: steady-state training throughput on the flagship config.

Measures the full jitted train step (frozen ViT-S/8 forward for img+img_pos in
one batched call, contrastive correlation loss with 5 negatives, linear +
cluster probe losses, 3 Adam updates) at the reference's training footprint:
batch 16, res 224 (reference src/configs/train_config.yml). Synthetic device-
resident data isolates the compute path (the host input pipeline is measured
separately in logs as imgs_per_sec during real training).

Baseline: the reference publishes no throughput numbers (BASELINE.md). We
anchor vs_baseline to an estimated 120 imgs/sec/A100 for the reference stack
(PyTorch 1.7 fp32 DDP, 3 ViT-S/8 no-grad forwards + head backward per step of
16 image pairs) — a generous estimate; re-anchor when a measured number exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

REFERENCE_A100_IMGS_PER_SEC = 120.0
# env overrides for ad-hoc rows (the driver's default run measures the
# reference train footprint: ViT-S/8, res 224, batch 16)
MODEL = os.environ.get("STEGO_BENCH_MODEL", "vit_small")
BATCH = int(os.environ.get("STEGO_BENCH_BATCH", 16))
RES = int(os.environ.get("STEGO_BENCH_RES", 224))
# the remote-tunneled platform runs the first ~10 executions of a program
# ~2.7x slow (see CLAUDE.md) — warm well past that before timing; the tunnel
# also adds sporadic multi-ms dispatch jitter, so we time several rounds and
# report the best (steady-state capability, not tunnel weather). Each round
# syncs ONCE via a scalar fetch whose ~30 ms round trip is amortized over
# STEPS — at 50 steps the residual bias is ~0.6 ms/step (was 25/~1.2 until
# round 3d; the method change is noted in CLAUDE.md).
WARMUP = 15
STEPS = 50
ROUNDS = 3


def main():
    from stego_tpu.config import Config
    from stego_tpu.models.vit import init_vit_params
    from stego_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )
    from stego_tpu.train.segmenter import UnsupervisedSegmenter, make_train_step

    cfg = Config(
        model_type=MODEL, dino_patch_size=8, res=RES, batch_size=BATCH,
        dataset_name="cocostuff27", backbone_dtype="bfloat16",
    )
    seg = UnsupervisedSegmenter(n_classes=27, cfg=cfg)

    key = jax.random.PRNGKey(0)
    from stego_tpu.models.vit import cast_params_for_compute

    backbone = cast_params_for_compute(init_vit_params(key, seg.vit_cfg),
                                       jnp.bfloat16)
    state = seg.init_state(jax.random.fold_in(key, 1))

    mesh = make_mesh()
    bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)
    backbone = jax.device_put(backbone, rsh)
    state = jax.device_put(state, rsh)

    batch = {
        "img": jax.device_put(
            jax.random.normal(jax.random.fold_in(key, 2),
                              (BATCH, RES, RES, 3), jnp.float32), bsh),
        "img_pos": jax.device_put(
            jax.random.normal(jax.random.fold_in(key, 3),
                              (BATCH, RES, RES, 3), jnp.float32), bsh),
        "label": jax.device_put(
            jax.random.randint(jax.random.fold_in(key, 4),
                               (BATCH, RES, RES), -1, 27), bsh),
        "label_pos": jax.device_put(
            jax.random.randint(jax.random.fold_in(key, 5),
                               (BATCH, RES, RES), -1, 27), bsh),
    }

    # the production hot step: hist observability lives in a separate jitted
    # variant dispatched only every hist_freq (=100) steps (train/app.py)
    jitted = jax.jit(make_train_step(seg, with_hist=False),
                     donate_argnums=(1,))
    # AOT-compile once; the same executable serves the timing loop and the
    # flop count for MFU reporting.
    train_step = jitted.lower(backbone, state, batch, key).compile()
    try:
        flops = float(train_step.cost_analysis()["flops"])
    except Exception:
        flops = 0.0

    # NOTE: on the remote-tunneled TPU platform, block_until_ready does not
    # reliably block; fetching a scalar with a data dependency on the full
    # step chain is the trustworthy sync point.
    def sync(metrics):
        return float(metrics["loss/total"])

    for i in range(WARMUP):
        state, metrics = train_step(backbone, state, batch,
                                    jax.random.fold_in(key, 100 + i))
    sync(metrics)

    dt = float("inf")
    for r in range(ROUNDS):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, metrics = train_step(backbone, state, batch,
                                        jax.random.fold_in(key, 200 + i))
        sync(metrics)
        dt = min(dt, time.perf_counter() - t0)

    # Honest MFU accounting: XLA's own flop count for the compiled step
    # (excludes transcendentals/copies), against the v5e bf16 MXU peak
    # (197 TFLOP/s).
    step_s = dt / STEPS
    tflops = flops / step_s / 1e12 if flops else 0.0

    n_dev = max(1, mesh.devices.size)
    imgs_per_sec_per_chip = (STEPS * BATCH) / dt / n_dev

    # secondary rows (VERDICT r2 weak #2: full-field + val step previously
    # lived only in prose) — same JSON line, skippable via STEGO_BENCH_EXTRA=0
    extra = {}
    if os.environ.get("STEGO_BENCH_EXTRA", "1") != "0":
        try:
            from stego_tpu.train.segmenter import make_val_step

            seg_ff = UnsupervisedSegmenter(
                n_classes=27, cfg=cfg.replace(full_field_loss=True))
            step_ff = jax.jit(make_train_step(seg_ff, with_hist=False),
                              donate_argnums=(1,))
            state_ff = jax.device_put(
                seg_ff.init_state(jax.random.fold_in(key, 7)), rsh)
            for i in range(12):
                state_ff, m_ff = step_ff(backbone, state_ff, batch,
                                         jax.random.fold_in(key, 300 + i))
            sync(m_ff)
            ff_dt = float("inf")
            for r in range(ROUNDS):
                t0 = time.perf_counter()
                for i in range(20):
                    state_ff, m_ff = step_ff(backbone, state_ff, batch,
                                             jax.random.fold_in(key, 400 + i))
                sync(m_ff)
                ff_dt = min(ff_dt, (time.perf_counter() - t0) / 20)
            extra["full_field_imgs_per_sec"] = round(BATCH / ff_dt / n_dev, 1)

            val_step = jax.jit(make_val_step(seg))
            vb = {"img": batch["img"], "label": batch["label"]}
            for _ in range(12):
                out = val_step(backbone, state["params"], vb)
            float(jnp.sum(out["conf_cluster"]))
            v_dt = float("inf")
            for r in range(ROUNDS):
                t0 = time.perf_counter()
                for _ in range(25):
                    out = val_step(backbone, state["params"], vb)
                float(jnp.sum(out["conf_cluster"]))
                v_dt = min(v_dt, (time.perf_counter() - t0) / 25)
            extra["val_step_ms"] = round(v_dt * 1e3, 2)

            # frozen-backbone feature-cache mode (cache_backbone_feats=true,
            # train/feat_cache.py): the step gathers precomputed trunk
            # features from HBM by int32 index — head + losses + 3 Adam
            # updates only, no backbone forward
            from stego_tpu.train.segmenter import make_cached_train_step

            hp = RES // seg.vit_cfg.patch_size
            kc = jax.random.fold_in(key, 9)
            cache = {
                "feats": jax.device_put(jax.random.normal(
                    kc, (256, hp, hp, seg.vit_cfg.embed_dim),
                    jnp.bfloat16), rsh),
                "label": jax.device_put(jax.random.randint(
                    jax.random.fold_in(kc, 1), (256, RES, RES), -1, 27,
                    jnp.int16), rsh),
            }
            cb = {
                "ind": jax.device_put(jax.random.randint(
                    jax.random.fold_in(kc, 2), (BATCH,), 0, 256, jnp.int32),
                    bsh),
                "ind_pos": jax.device_put(jax.random.randint(
                    jax.random.fold_in(kc, 3), (BATCH,), 0, 256, jnp.int32),
                    bsh),
            }
            step_c = jax.jit(make_cached_train_step(seg, with_hist=False),
                             donate_argnums=(1,))
            state_c = jax.device_put(
                seg.init_state(jax.random.fold_in(key, 8)), rsh)
            for i in range(WARMUP):
                state_c, m_c = step_c(cache, state_c, cb,
                                      jax.random.fold_in(key, 500 + i))
            sync(m_c)
            c_dt = float("inf")
            for r in range(ROUNDS):
                t0 = time.perf_counter()
                for i in range(STEPS):
                    state_c, m_c = step_c(cache, state_c, cb,
                                          jax.random.fold_in(key, 600 + i))
                sync(m_c)
                c_dt = min(c_dt, (time.perf_counter() - t0) / STEPS)
            extra["feat_cached_imgs_per_sec"] = round(BATCH / c_dt / n_dev, 1)

            # multi-step dispatch (steps_per_dispatch=16): K cached steps ride
            # one lax.scan dispatch, amortizing per-dispatch latency
            # (segmenter.make_cached_multi_step)
            from stego_tpu.parallel.mesh import stacked_batch_sharding
            from stego_tpu.train.segmenter import make_cached_multi_step

            K = 16
            ssh = stacked_batch_sharding(mesh)
            cbk = {
                "ind": jax.device_put(jax.random.randint(
                    jax.random.fold_in(kc, 4), (K, BATCH), 0, 256, jnp.int32),
                    ssh),
                "ind_pos": jax.device_put(jax.random.randint(
                    jax.random.fold_in(kc, 5), (K, BATCH), 0, 256, jnp.int32),
                    ssh),
            }
            step_k = jax.jit(make_cached_multi_step(seg, K),
                             donate_argnums=(1,))
            state_k = jax.device_put(
                seg.init_state(jax.random.fold_in(key, 10)), rsh)
            for i in range(12):
                state_k, m_k = step_k(cache, state_k, cbk, key, i * K)
            sync({"loss/total": m_k["loss/total"][-1]})
            k_dt = float("inf")
            for r in range(ROUNDS):
                t0 = time.perf_counter()
                for i in range(12):
                    state_k, m_k = step_k(cache, state_k, cbk, key,
                                          1000 + i * K)
                sync({"loss/total": m_k["loss/total"][-1]})
                k_dt = min(k_dt, (time.perf_counter() - t0) / (12 * K))
            extra["feat_cached_k16_imgs_per_sec"] = round(
                BATCH / k_dt / n_dev, 1)

            # the reference's headline user journey (eval_segmentation.py:
            # 119-155): res-320 flip-TTA eval with both probes + device
            # confusion matrices, batch 8
            from stego_tpu.eval.evaluate import make_eval_step

            EB, ERES = 8, 320
            ke = jax.random.fold_in(key, 11)
            eimg = jax.device_put(jax.random.normal(
                ke, (EB, ERES, ERES, 3), jnp.float32), bsh)
            elab = jax.device_put(jax.random.randint(
                jax.random.fold_in(ke, 1), (EB, ERES, ERES), -1, 27), bsh)
            estep = jax.jit(make_eval_step(seg, run_crf=False,
                                           with_conf=True))
            for _ in range(12):
                eouts = estep(backbone, state["params"], eimg, elab)
            float(jnp.sum(eouts[2]))
            e_dt = float("inf")
            for r in range(ROUNDS):
                t0 = time.perf_counter()
                for _ in range(20):
                    eouts = estep(backbone, state["params"], eimg, elab)
                float(jnp.sum(eouts[2]))
                e_dt = min(e_dt, (time.perf_counter() - t0) / 20)
            extra["eval_res320_tta_imgs_per_sec"] = round(EB / e_dt / n_dev, 1)

            # on-device mean-field CRF (reference crf.py:13-45 params),
            # res-320 images, 27 classes, 10 iterations
            from stego_tpu.ops.crf import dense_crf

            img01 = jax.device_put(jax.random.uniform(
                jax.random.fold_in(ke, 2), (EB, ERES, ERES, 3)), bsh)
            clogits = jax.device_put(jax.random.normal(
                jax.random.fold_in(ke, 3), (EB, 40, 40, 27)), bsh)
            for _ in range(8):
                cprobs = dense_crf(img01, clogits)
            float(jnp.sum(cprobs[:, 0, 0]))
            cr_dt = float("inf")
            for r in range(ROUNDS):
                t0 = time.perf_counter()
                for _ in range(10):
                    cprobs = dense_crf(img01, clogits)
                float(jnp.sum(cprobs[:, 0, 0]))
                cr_dt = min(cr_dt, (time.perf_counter() - t0) / 10)
            extra["crf_device_ms_per_img"] = round(cr_dt / EB * 1e3, 2)

            # exact host CRF (native permutohedral lattice, the
            # pydensecrf-equivalent backend) — single-core host path
            import numpy as np

            from stego_tpu.ops.crf_exact import dense_crf_exact

            h_img = np.asarray(jax.device_get(img01[0]))
            h_log = np.asarray(jax.device_get(clogits[0]))
            dense_crf_exact(h_img, h_log)  # warm (lattice build paths)
            t0 = time.perf_counter()
            for _ in range(2):
                dense_crf_exact(h_img, h_log)
            extra["crf_exact_host_ms_per_img"] = round(
                (time.perf_counter() - t0) / 2 * 1e3, 1)
        except Exception as e:  # secondary metrics must never break the bench
            extra["extra_error"] = str(e)[:120]

    print(json.dumps({
        "metric": f"train_imgs_per_sec_per_chip ({MODEL}/8, res{RES}, "
                  f"batch{BATCH})",
        "value": round(imgs_per_sec_per_chip, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / REFERENCE_A100_IMGS_PER_SEC, 3),
        "step_ms": round(step_s * 1e3, 2),
        "model_tflops_per_sec": round(tflops, 1),
        "mfu_vs_v5e_bf16_peak": round(tflops / 197.0, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
