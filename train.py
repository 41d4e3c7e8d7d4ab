#!/usr/bin/env python
"""Thin wrapper: ``python train.py ...`` == ``python -m vfr_tpu.cli train ...``."""
import sys

from vfr_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["train"] + sys.argv[1:]))
