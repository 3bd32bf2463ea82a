#!/usr/bin/env python
"""Publication-style figures from pooled results.

Python equivalent of the reference's R/ggplot2 scripts
(/root/reference/experiments/plot_results.R): LPPD / RMSE / accuracy
versus ablation axes with per-sampler series.

    python experiments/plot_results.py aggr_results.csv -o figures/
"""
from __future__ import annotations

import argparse
from pathlib import Path

import matplotlib

matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402
import pandas as pd  # noqa: E402

METRICS = ['lppd', 'rmse', 'acc', 'nll', 'cal_error', 'de_lppd']
AXES = ['data.path', 'model.hidden_structure', 'rng',
        'training.sampler.desired_energy_var_end',
        'training.sampler.warmup_steps']


def plot_metric_by_axis(df: pd.DataFrame, metric: str, axis: str,
                        out_dir: Path) -> bool:
    if metric not in df or axis not in df or df[metric].isna().all():
        return False
    sub = df.dropna(subset=[metric])
    if sub[axis].nunique() < 2:
        return False
    fig, ax = plt.subplots(figsize=(7, 4))
    sampler_col = 'training.sampler.name'
    groups = (sub.groupby(sampler_col) if sampler_col in sub
              else [('all', sub)])
    for name, g in groups:
        stats = g.groupby(axis)[metric].agg(['mean', 'std'])
        ax.errorbar(range(len(stats)), stats['mean'], yerr=stats['std'],
                    marker='o', capsize=3, label=str(name))
        ax.set_xticks(range(len(stats)))
        ax.set_xticklabels([str(v)[-25:] for v in stats.index],
                           rotation=30, ha='right', fontsize=7)
    ax.set_xlabel(axis)
    ax.set_ylabel(metric)
    ax.legend(fontsize=8)
    fig.tight_layout()
    safe = f'{metric}_by_{axis}'.replace('.', '_').replace('/', '_')
    fig.savefig(out_dir / f'{safe}.png', dpi=120)
    plt.close(fig)
    return True


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument('results_csv', type=Path)
    parser.add_argument('-o', '--out_dir', type=Path,
                        default=Path('figures'))
    args = parser.parse_args()
    df = pd.read_csv(args.results_csv)
    args.out_dir.mkdir(parents=True, exist_ok=True)
    made = sum(plot_metric_by_axis(df, m, a, args.out_dir)
               for m in METRICS for a in AXES)
    print(f'wrote {made} figures to {args.out_dir}')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
