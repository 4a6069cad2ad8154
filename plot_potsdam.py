#!/usr/bin/env python
"""Entry-point parity with reference src/plot_potsdam.py."""

from stego_tpu.eval.plot_apps import potsdam_main

if __name__ == "__main__":
    potsdam_main()
