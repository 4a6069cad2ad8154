#!/usr/bin/env python
"""Build KNN caches (entry-point parity with reference src/precompute_knns.py)."""

from stego_tpu.train.knn_app import main

if __name__ == "__main__":
    main()
