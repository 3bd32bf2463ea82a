#!/usr/bin/env python
"""Markdown summary tables from a pooled study CSV.

Groups a ``pool_results.py`` CSV by config axes and prints mean ± std of
the chosen metrics — the exact tables used in docs/RESULTS.md, generated
instead of hand-assembled.

    python experiments/summarize_study.py aggr_results/aggr_dataset.csv \
        -g data.path -m lppd de_lppd rmse
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd


def summarize(df: pd.DataFrame, group_cols: list[str],
              metrics: list[str]) -> str:
    group_cols = [c for c in group_cols if c in df.columns]
    metrics = [m for m in metrics if m in df.columns]
    if not group_cols or not metrics:
        return f'(no usable columns; have: {sorted(df.columns)[:40]}...)'

    def fmt(g: pd.DataFrame, m: str) -> str:
        v = pd.to_numeric(g[m], errors='coerce')
        n_nan = int(v.isna().sum())
        v = v.dropna()
        if not len(v):
            return 'NaN (all)'
        cell = f'{v.mean():.3f}'
        if len(v) > 1:
            cell += f' ± {v.std(ddof=1):.3f}'
        if n_nan:
            cell += f' [{n_nan} NaN]'
        return cell

    header = group_cols + metrics + ['n']
    lines = ['| ' + ' | '.join(header) + ' |',
             '|' + '---|' * len(header)]
    for key, g in df.groupby(group_cols, dropna=False):
        key = key if isinstance(key, tuple) else (key,)
        cells = [Path(str(k)).stem if '/' in str(k) else str(k)
                 for k in key]
        cells += [fmt(g, m) for m in metrics]
        cells.append(str(len(g)))
        lines.append('| ' + ' | '.join(cells) + ' |')
    return '\n'.join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('csv', type=Path)
    ap.add_argument('-g', '--group', nargs='+', default=['data.path'])
    ap.add_argument('-m', '--metrics', nargs='+',
                    default=['de_lppd', 'lppd', 'rmse'])
    args = ap.parse_args()
    df = pd.read_csv(args.csv)
    print(summarize(df, args.group, args.metrics))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
