#!/usr/bin/env python
"""Aggregate experiment results into one CSV.

Reference: /root/reference/experiments/pool_results.py:17-111. Walks a
results tree, joins each experiment's ``config.yaml`` + ``metrics.pkl`` +
``diagnostics.csv`` + parsed wall-times into one row, and writes
``aggr_results.csv``.

    python experiments/pool_results.py results/ [-o aggr_results.csv]
"""
from __future__ import annotations

import argparse
import pickle
import re
from pathlib import Path

import numpy as np
import pandas as pd
import yaml

TIME_RE = re.compile(r'(time\.\w+) took ([0-9.]+) seconds')


def parse_times(log_path: Path) -> dict:
    """Parse ``time.X took Ys`` lines (self-contained — this script must
    run without the package on sys.path)."""
    times: dict = {}
    if log_path.exists():
        for match in TIME_RE.finditer(log_path.read_text()):
            times[match.group(1)] = float(match.group(2))
    return times


def flatten_config(cfg: dict, prefix: str = '') -> dict:
    out = {}
    for k, v in cfg.items():
        key = f'{prefix}{k}'
        if isinstance(v, dict):
            out.update(flatten_config(v, f'{key}.'))
        else:
            out[key] = str(v) if isinstance(v, list) else v
    return out


def collect_experiment(exp_dir: Path) -> dict | None:
    cfg_file = exp_dir / 'config.yaml'
    if not cfg_file.exists():
        return None
    row = {'experiment_dir': str(exp_dir)}
    row.update(flatten_config(yaml.safe_load(cfg_file.read_text())))

    metrics_file = exp_dir / 'metrics.pkl'
    if metrics_file.exists():
        with open(metrics_file, 'rb') as f:
            metrics = pickle.load(f)
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                row[k] = v
            elif isinstance(v, np.ndarray) and v.ndim <= 1:
                row[f'{k}_mean'] = float(np.mean(v))
                row[f'{k}_std'] = float(np.std(v))

    diag_file = exp_dir / 'diagnostics.csv'
    if diag_file.exists():
        diag = pd.read_csv(diag_file)
        for col in ('ess', 'bcv', 'wcv', 'split_rhat'):
            if col in diag:
                row[f'mean_{col}'] = float(diag[col].mean())

    # tuned sampler parameters + per-draw statistics (the reference pools
    # step_size/L into its figure data, plot_results.R lines 100-158, and
    # plots gradient evaluations, lines 850-909)
    info_file = exp_dir / 'samples' / 'info.pkl'
    if info_file.exists():
        with open(info_file, 'rb') as f:
            info = pickle.load(f)
        for k in ('step_size', 'L'):
            if k in info:
                v = np.asarray(info[k], dtype=np.float64)
                row[k] = float(np.mean(v))
                row[f'sd_{k}'] = float(np.std(v))
        for k in ('acceptance_rate', 'num_integration_steps'):
            if k in info:
                row[f'mean_{k}'] = float(np.mean(np.asarray(info[k],
                                                            np.float64)))
        if 'is_divergent' in info:
            row['n_divergent'] = int(np.sum(info['is_divergent']))

    row.update(parse_times(exp_dir / 'training.log'))
    return row


def pool(results_root: Path) -> pd.DataFrame:
    rows = []
    for cfg_file in sorted(results_root.rglob('config.yaml')):
        row = collect_experiment(cfg_file.parent)
        if row:
            rows.append(row)
    return pd.DataFrame(rows)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument('results_root', type=Path)
    parser.add_argument('-o', '--output', type=Path,
                        default=Path('aggr_results.csv'))
    args = parser.parse_args()
    df = pool(args.results_root)
    df.to_csv(args.output, index=False)
    print(f'pooled {len(df)} experiments -> {args.output}')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
