#!/usr/bin/env python
"""Evaluate checkpoints (entry-point parity with reference
src/eval_segmentation.py). Accepts orbax checkpoint dirs or reference
Lightning .ckpt files via model_path=... / model_paths=a,b."""

from stego_tpu.eval.evaluate import main

if __name__ == "__main__":
    main()
