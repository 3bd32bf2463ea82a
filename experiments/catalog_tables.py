"""Markdown tables for docs/RESULTS.md from the pooled catalogue CSVs.

One table per study, mean ± std over seeds, mirroring the reference's
aggregation in plot_results.R (complexity: lines 100-158; datasize:
159-210; diagnostics: 740-840). Reads aggr_results/aggr_<study>.csv
produced by experiments/pool_results.py.

Usage: python experiments/catalog_tables.py [complexity datasize ...]
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

import pandas as pd

AGGR = Path(__file__).resolve().parent.parent / 'aggr_results'


def _method(row) -> str:
    name = Path(row['experiment_dir']).name
    if '_de_' in name or name.startswith(('de_', 'bike_de')):
        return 'DE'
    if '_nuts_' in name or 'nuts' in name:
        return 'NUTS'
    return 'MCLMC'


def _agg(df: pd.DataFrame, group_cols: list[str], metrics: list[str]):
    df = df.copy()
    df['method'] = df.apply(_method, axis=1)
    rows = []
    for key, g in df.groupby(group_cols + ['method'], dropna=False):
        rec = dict(zip(group_cols + ['method'], key))
        rec['n'] = len(g)
        for m in metrics:
            if m in g and g[m].notna().any():
                rec[m] = g[m].mean()
                rec[f'{m}_sd'] = g[m].std()
        rows.append(rec)
    return pd.DataFrame(rows)


def _fmt(v, sd=None):
    if pd.isna(v):
        return '—'
    s = f'{v:.3f}'
    if sd is not None and not pd.isna(sd):
        s += f' ± {sd:.3f}'
    return s


def _md(agg: pd.DataFrame, axis: str, metrics: list[str]) -> str:
    methods = [m for m in ('DE', 'MCLMC', 'NUTS') if
               (agg['method'] == m).any()]
    header = [axis] + [f'{meth} {m}' for m in metrics for meth in methods]
    lines = ['| ' + ' | '.join(header) + ' |',
             '|' + '---|' * len(header)]
    for val in sorted(agg[axis].dropna().unique(),
                      key=lambda v: (len(str(v)), str(v))):
        cells = [str(val)]
        sub = agg[agg[axis] == val]
        for m in metrics:
            for meth in methods:
                r = sub[sub['method'] == meth]
                if len(r) and m in r:
                    cells.append(_fmt(r.iloc[0].get(m),
                                      r.iloc[0].get(f'{m}_sd')))
                else:
                    cells.append('—')
        lines.append('| ' + ' | '.join(cells) + ' |')
    return '\n'.join(lines)


def complexity():
    df = pd.read_csv(AGGR / 'aggr_complexity.csv')
    df['width'] = df['model.hidden_structure'].map(
        lambda s: int(re.findall(r'\d+', str(s))[0]))
    agg = _agg(df, ['width'], ['lppd', 'rmse'])
    print('### complexity (bikesharing, hidden width, seeds 1-3)\n')
    print(_md(agg, 'width', ['lppd', 'rmse']))


def datasize():
    df = pd.read_csv(AGGR / 'aggr_datasize.csv')
    agg = _agg(df, ['data.datapoint_limit'], ['lppd', 'rmse'])
    print('### datasize (protein, datapoint limit, seeds 1-3)\n')
    print(_md(agg, 'data.datapoint_limit', ['lppd', 'rmse']))


def feasibility():
    df = pd.read_csv(AGGR / 'aggr_feasibility.csv')
    df['dataset'] = df['data.path'].map(lambda p: Path(str(p)).stem)
    agg = _agg(df, ['dataset'], ['lppd', 'rmse', 'de_lppd'])
    print('### feasibility (10-layer FCN)\n')
    print(_md(agg, 'dataset', ['lppd', 'rmse', 'de_lppd']))


def diagnostics():
    df = pd.read_csv(AGGR / 'aggr_diagnostics.csv')
    df['dataset'] = df['data.path'].map(lambda p: Path(str(p)).stem)
    mets = ['lppd', 'mean_ess', 'mean_split_rhat', 'mean_bcv', 'mean_wcv']
    agg = _agg(df, ['dataset'], mets)
    print('### diagnostics study (deep-8 FCN, seeds 1-3)\n')
    print(_md(agg, 'dataset', mets))


if __name__ == '__main__':
    studies = sys.argv[1:] or ['complexity', 'datasize', 'feasibility',
                               'diagnostics']
    for s in studies:
        globals()[s]()
        print()
