#!/usr/bin/env python
"""Train STEGO-TPU. Entry-point parity with the reference
src/train_segmentation.py: ``python train_segmentation.py [--key value | key=value]...``
Optional ``config=<yaml>`` loads a base config file first."""

from stego_tpu.train.app import main

if __name__ == "__main__":
    main()
