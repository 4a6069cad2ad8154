#!/usr/bin/env python
"""Folder-of-images inference (entry-point parity with reference
src/demo_segmentation.py)."""

from stego_tpu.eval.demo import main

if __name__ == "__main__":
    main()
