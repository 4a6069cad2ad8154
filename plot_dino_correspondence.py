#!/usr/bin/env python
"""Entry-point parity with reference src/plot_dino_correspondence.py."""

from stego_tpu.eval.plot_apps import correspondence_main

if __name__ == "__main__":
    correspondence_main()
