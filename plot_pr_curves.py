#!/usr/bin/env python
"""Entry-point parity with reference src/plot_pr_curves.py."""

from stego_tpu.eval.plot_apps import pr_curves_main

if __name__ == "__main__":
    pr_curves_main()
