#!/usr/bin/env python
"""Standalone CRF-loss experiment (working port of reference src/train_crf.py)."""

from stego_tpu.train.crf_app import main

if __name__ == "__main__":
    main()
