#!/usr/bin/env python
"""Thin wrapper: ``python corpus_eval.py ...`` == ``python -m vfr_tpu.cli corpus ...``."""
import sys

from vfr_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["corpus"] + sys.argv[1:]))
