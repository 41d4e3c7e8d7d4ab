#!/usr/bin/env python
"""Thin wrapper: ``python evaluate.py ...`` == ``python -m vfr_tpu.cli eval ...``."""
import sys

from vfr_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["eval"] + sys.argv[1:]))
