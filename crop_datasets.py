#!/usr/bin/env python
"""Materialize five/random crops (entry-point parity with reference
src/crop_datasets.py)."""

from stego_tpu.data.crop import main

if __name__ == "__main__":
    main()
