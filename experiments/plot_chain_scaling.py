"""Render the chain-count scaling figure from bench.py --chain-scaling.

Reads the JSON lines `bench.py --chain-scaling {airfoil,fcn}` prints
(one per ensemble size), plots samples/s and per-chain throughput vs
n_chains on log-log axes, and marks where per-chain throughput starts
falling — the point the chain batch saturates the chip (MXU occupancy
for the small posterior, HBM/FLOP limit for the wide one).
BASELINE.json configs[4] "1024+ particles" axis, single-chip edition.

Usage:
    python bench.py --chain-scaling airfoil | tee /tmp/scale_airfoil.jsonl
    python bench.py --chain-scaling fcn     | tee /tmp/scale_fcn.jsonl
    python experiments/plot_chain_scaling.py /tmp/scale_airfoil.jsonl \
        /tmp/scale_fcn.jsonl -o docs/figures
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402

C_MCLMC, C_NUTS = '#F35B04', '#3D348B'  # reference palette (plot_results.R)


def load_points(path: Path):
    pts, dim = [], None
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line.startswith('{'):
            continue
        rec = json.loads(line)
        if rec.get('metric', '').endswith('_summary'):
            dim = rec.get('dim')
        elif 'n_chains' in rec:
            pts.append((rec['n_chains'], rec['value']))
    return sorted(pts), dim


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('jsonl', nargs='+', type=Path)
    ap.add_argument('-o', '--out-dir', type=Path, default=Path('docs/figures'))
    args = ap.parse_args()

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.6))
    colors = [C_MCLMC, C_NUTS, '#014704']
    for path, color in zip(args.jsonl, colors):
        pts, dim = load_points(path)
        if not pts:
            continue
        n = [p[0] for p in pts]
        sps = [p[1] for p in pts]
        label = path.stem.replace('scale_', '')
        if dim:
            label += f' ({dim:,}-dim)'
        ax1.plot(n, sps, 'o-', color=color, label=label)
        ax2.plot(n, [s / c for s, c in zip(sps, n)], 'o-', color=color,
                 label=label)
    for ax, ylab in ((ax1, 'ensemble samples/s'),
                     (ax2, 'per-chain samples/s')):
        ax.set_xscale('log', base=2)
        ax.set_yscale('log')
        ax.set_xlabel('n_chains')
        ax.set_ylabel(ylab)
        ax.grid(alpha=0.3)
        ax.legend(fontsize=8)
    fig.suptitle('MCLMC throughput vs ensemble size (TPU v5e, 1 chip)',
                 fontsize=10)
    args.out_dir.mkdir(parents=True, exist_ok=True)
    out = args.out_dir / 'chain_scaling.png'
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f'wrote {out}')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
