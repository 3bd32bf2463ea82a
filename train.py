#!/usr/bin/env python
"""Experiment CLI.

Mirrors the reference entry point (/root/reference/train.py:22-133):

    python train.py -c config.yaml [-s search.yaml] [-d N] [--outer_parallel]

Implementation lives in :mod:`mile_tpu.cli`; this wrapper keeps the
reference-style invocation working from the repo root.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mile_tpu.cli import main

if __name__ == '__main__':
    sys.exit(main())
