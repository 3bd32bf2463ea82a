#!/usr/bin/env python
"""Preprocess raw UCI classification datasets to the bundled .data format.

Equivalent of the reference's data prep
(/root/reference/data/preprocess_uci_class.py:21-121, itself following the
PGPS repository's preprocessing): load the raw UCI download, coerce the
label column to contiguous integer classes starting at 0, drop rows with
missing values, and write a space-delimited ``<name>_proc.data`` matrix
with the label as the last column. Feature z-normalization happens at
load time in :class:`mile_tpu.data.TabularLoader` (config ``normalize``).

The repository already bundles the processed files under ``data/``; this
script exists to regenerate them from raw downloads.

    python experiments/preprocess_uci_class.py raw/ -o data/
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

RAW_FILES = {
    'sonar': ('sonar.csv', ',', -1),
    'wine_red': ('winequality-red.csv', ';', -1),
    'wine_white': ('winequality-white.csv', ';', -1),
    'heart': ('processed.cleveland.data', ',', -1),
    'glass': ('glass.data', ',', -1),
    'australian': ('australian.dat', ' ', -1),
    'covertype': ('covtype.data', ',', -1),
}


def preprocess(name: str, raw_dir: Path, out_dir: Path) -> Path:
    fname, delim, label_col = RAW_FILES[name]
    df = pd.read_csv(raw_dir / fname, sep=delim, header=None,
                     na_values=['?'])
    df = df.dropna()
    if name == 'glass':  # first column is a row id
        df = df.iloc[:, 1:]
    labels = df.iloc[:, label_col]
    # map labels (strings or non-contiguous ints) -> 0..K-1
    classes = sorted(labels.unique(), key=str)
    mapping = {c: i for i, c in enumerate(classes)}
    y = labels.map(mapping).to_numpy(dtype=np.float64)
    if name == 'heart':  # presence-of-disease binarization (1-4 -> 1)
        y = (labels.to_numpy(dtype=np.float64) > 0).astype(np.float64)
    x = df.drop(df.columns[label_col], axis=1).to_numpy(dtype=np.float64)
    out = np.column_stack([x, y])
    out_path = out_dir / f'{name}_proc.data'
    np.savetxt(out_path, out, delimiter=' ', fmt='%.10g')
    print(f'{name}: {out.shape[0]} rows, {out.shape[1] - 1} features, '
          f'{len(np.unique(y))} classes -> {out_path}')
    return out_path


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument('raw_dir', type=Path)
    parser.add_argument('-o', '--out_dir', type=Path, default=Path('data'))
    parser.add_argument('--datasets', nargs='*', default=list(RAW_FILES))
    args = parser.parse_args()
    args.out_dir.mkdir(parents=True, exist_ok=True)
    for name in args.datasets:
        preprocess(name, args.raw_dir, args.out_dir)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
