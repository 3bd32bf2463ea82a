#!/usr/bin/env python
"""Print a docs/ARTIFACTS.md-style manifest table for an experiment dir.

    python experiments/make_manifest.py results/repl_uci/mclmc_48
"""
from __future__ import annotations

import hashlib
import sys
from pathlib import Path


def main() -> int:
    root = Path(sys.argv[1])
    print('| file | bytes | sha256 (first 16 hex) |')
    print('|---|---|---|')
    for p in sorted(root.rglob('*')):
        if not p.is_file():
            continue
        digest = hashlib.sha256(p.read_bytes()).hexdigest()[:16]
        print(f'| {p.relative_to(root)} | {p.stat().st_size} | {digest} |')
    return 0


if __name__ == '__main__':
    sys.exit(main())
