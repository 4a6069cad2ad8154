#!/usr/bin/env python
"""Accuracy regression benchmark on the deterministic synthetic mosaic.

The released checkpoints / real datasets are unreachable offline, so this is
the tracked accuracy half of the north star (BASELINE.md): generate the
textured-mosaic dataset (stego_tpu/data/synthetic.py — hard enough that
cluster mIoU < 100), build KNN caches, train the full pipeline to
convergence with a RANDOM backbone (no DINO weights offline), and print the
final Hungarian-matched metrics as one JSON line. Deterministic in the seed;
record the measured numbers in BASELINE.md and treat drops as regressions.

Usage (defaults reproduce the BASELINE.md row):
    python scripts/accuracy_bench.py [output_root=/tmp/acc_bench] [steps=300]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from stego_tpu.config import Config, prep_args
    from stego_tpu.data.synthetic import write_synthetic_benchmark
    from stego_tpu.train.app import train
    from stego_tpu.train.knn_app import precompute_knns

    args = prep_args(argv)
    out_root = args.pop("output_root", "/tmp/acc_bench")
    steps = int(args.pop("steps", 300))
    res = int(args.pop("res", 96))
    if args:
        raise SystemExit(f"unknown args: {sorted(args)}")

    data_root = os.path.join(out_root, "data")
    write_synthetic_benchmark(data_root, res=res)

    cfg = Config(
        output_root=os.path.join(out_root, "out"),
        pytorch_data_dir=data_root,
        dataset_name="directory", dir_dataset_name="synthbench",
        dir_dataset_n_classes=4,
        experiment_name="acc_bench",
        model_type="vit_small", dino_patch_size=8,
        res=res, val_res=res, batch_size=16, val_batch_size=16,
        max_steps=steps, val_freq=steps, checkpoint_freq=steps,
        num_neighbors=4, crop_type=None, loader_crop_type="center",
        backbone_dtype="bfloat16", cache_dataset=True, seed=0,
    )
    precompute_knns(cfg, dataset_names=["directory"], crop_types=[None],
                    res=res, batch_size=16)
    metrics = train(cfg)
    print(json.dumps({
        "benchmark": "synthetic-mosaic accuracy (random ViT-S/8 backbone)",
        "steps": steps, "res": res,
        **{k: round(float(v), 2) for k, v in metrics.items()},
    }))

    # Hard regression bands at the default footprint: ~15% below the pinned
    # chip measurement (BASELINE.md, v5e, seed 0, 300 steps, res 96,
    # 2026-08-17: linear mIoU 10.51 / Acc 29.27, cluster mIoU 7.56 /
    # Acc 30.25). Non-default footprints print only.
    if steps == 300 and res == 96:
        bands = {
            "test/linear/mIoU": 8.9,
            "test/linear/Accuracy": 24.9,
            "test/cluster/mIoU": 6.4,
            "test/cluster/Accuracy": 25.7,
        }
        failed = {k: (round(float(metrics[k]), 2), v)
                  for k, v in bands.items() if float(metrics[k]) < v}
        if failed:
            raise SystemExit(
                f"ACCURACY REGRESSION vs BASELINE.md bands: {failed}")
        print(json.dumps({"accuracy_gate": "pass", "bands": bands}))

        sensitive(out_root)


def sensitive(out_root: str):
    """Second chip row: the SENSITIVE instrument (VERDICT r4 weak #6).

    The full-size random ViT attenuates the texture signal (cluster mIoU
    ~7.6, so the ±15% band is ~1 point); the suite's 2-block net reaches
    ~22 mIoU on this task and moves when numerics move — but the suite runs
    it on CPU in f32. This row runs the same 2-block configuration through
    the REAL chip dispatch stack (bf16 trunk, Pallas attention + fused
    correlation loss, Mosaic-compiled) with its own pinned bands, so a
    Mosaic-compile numerics regression shows up in accuracy terms.
    """
    from stego_tpu.data.synthetic import tiny_benchmark_setup
    from stego_tpu.train.app import train
    from stego_tpu.train.knn_app import precompute_knns

    cfg, vit = tiny_benchmark_setup(
        os.path.join(out_root, "sensitive"),
        experiment_name="acc_sensitive", backbone_dtype="bfloat16")
    precompute_knns(cfg, dataset_names=["directory"], crop_types=[None],
                    vit_cfg=vit, res=64, batch_size=8)
    metrics = train(cfg, vit_cfg=vit)
    print(json.dumps({
        "benchmark": "synthetic-mosaic accuracy (SENSITIVE 2-block net, "
                     "chip bf16 dispatch stack)",
        "steps": 40, "res": 64,
        **{k: round(float(v), 2) for k, v in metrics.items()},
    }))
    # bands ~15% below the pinned chip measurement (BASELINE.md round 5,
    # v5e, seed 0, 2026-08-19: linear mIoU 72.51 / Acc 86.78, cluster
    # mIoU 22.23 / Acc 46.11)
    bands = {
        "test/linear/mIoU": 61.5,
        "test/linear/Accuracy": 73.5,
        "test/cluster/mIoU": 18.9,
        "test/cluster/Accuracy": 39.0,
    }
    failed = {k: (round(float(metrics[k]), 2), v)
              for k, v in bands.items() if float(metrics[k]) < v}
    if failed:
        raise SystemExit(
            f"SENSITIVE ACCURACY REGRESSION vs BASELINE.md bands: {failed}")
    print(json.dumps({"sensitive_accuracy_gate": "pass", "bands": bands}))


if __name__ == "__main__":
    main()
