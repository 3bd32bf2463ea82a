#!/usr/bin/env python
"""Publication figures from pooled results (``aggr_results.csv``).

Python equivalent of the reference's R/ggplot2 script
(/root/reference/experiments/plot_results.R, ~1070 LoC, 11 figure
families). Each family degrades gracefully when its columns/axes are
absent from the pooled CSV, so one command renders whatever the results
tree supports:

    python experiments/plot_results.py aggr_results.csv -o figures/

Families (reference line ranges):
- hyperparameter ablations with DE/NUTS baseline lines, faceted over
  LPPD / RMSE / L / step size (R 100-443): desired_energy_variance,
  effective_samples, warmstart_budget, trust_in_estimate, datasize
- hidden_structure: metric vs architecture per sampler, std ribbons
  (R 468-592)
- sampling_times: warmstart/sampling wall-clock per experiment (R 600-692)
- grad_evals: gradient evaluations per kept draw (R 850-909)
- diagnostics: ESS / split-R-hat / BCV / WCV distributions per sampler
  (R 915-963)
- coverage: empirical vs nominal coverage per dataset (R 970-1056)
- generic metric-by-axis scatter fallback for any other search axis
"""
from __future__ import annotations

import argparse
import ast
from pathlib import Path

import matplotlib

matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

# reference palette (plot_results.R): MCLMC orange, NUTS purple, DE green
C_MCLMC, C_NUTS, C_DE = '#F35B04', '#3D348B', '#014704'
SAMPLER_COL = 'training.sampler.name'
ABLATION_AXES = {
    'desired_energy_variance':
        ('training.sampler.desired_energy_var_start',
         'training.sampler.desired_energy_var_end'),
    'effective_samples': ('training.sampler.num_effective_samples', None),
    'warmstart_budget': ('training.sampler.warmup_steps', None),
    'trust_in_estimate': ('training.sampler.trust_in_estimate', None),
    'datasize': ('data.datapoint_limit', None),
}
# every sweepable sampler knob; when plotting one axis, the others are
# pinned to their modal (base-config) value so sweeps pooled into one
# CSV don't contaminate each other's curves (and DE runs — whose
# sampler is a token mclmc at default knobs — drop out automatically)
_SWEEP_COLS = [
    'training.sampler.desired_energy_var_start',
    'training.sampler.desired_energy_var_end',
    'training.sampler.num_effective_samples',
    'training.sampler.warmup_steps',
    'training.sampler.trust_in_estimate',
]
FACET_METRICS = [('lppd', 'LPPD'), ('rmse', 'RMSE'), ('L', 'L'),
                 ('step_size', 'Step Size')]


def _save(fig, out_dir: Path, name: str) -> str:
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f'{name}.png'
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)
    return str(path)


def _mclmc_rows(df: pd.DataFrame) -> pd.DataFrame:
    if SAMPLER_COL not in df:
        return df
    return df[df[SAMPLER_COL].astype(str).str.lower()
              .str.contains('mclmc', na=False)]


def _nuts_rows(df: pd.DataFrame) -> pd.DataFrame:
    if SAMPLER_COL not in df:
        return df.iloc[0:0]
    return df[df[SAMPLER_COL].astype(str).str.lower()
              .str.contains('nuts', na=False)]


# ------------------------------------------------- hyperparameter ablation
def _pin_other_sweeps(sub: pd.DataFrame, keep_cols: tuple) -> pd.DataFrame:
    """Restrict rows to the modal value of every sweep column OTHER than
    the ones being plotted — isolates one sweep out of a pooled CSV."""
    for col in _SWEEP_COLS:
        if col in keep_cols or col not in sub:
            continue
        vals = sub[col].dropna()
        if vals.nunique() > 1:
            sub = sub[sub[col] == vals.mode().iloc[0]]
    return sub


def ablation_figure(df: pd.DataFrame, x_col: str, name: str,
                    out_dir: Path, series_col: str | None = None
                    ) -> str | None:
    """Faceted LPPD/RMSE/L/step-size vs one ablation axis; MCLMC points
    with std bars (one line per ``series_col`` value), dashed NUTS and
    dotted DE baselines (R 100-158)."""
    sub = _mclmc_rows(df)
    if x_col not in sub or sub[x_col].dropna().nunique() < 2:
        # e.g. only the end target was swept: promote the series axis
        if (series_col and series_col in sub
                and sub[series_col].dropna().nunique() >= 2):
            x_col, series_col = series_col, None
        else:
            return None
    sub = sub.dropna(subset=[x_col])
    sub = _pin_other_sweeps(sub, (x_col, series_col))
    if series_col is not None and (series_col not in sub
                                   or sub[series_col].nunique() < 2):
        series_col = None
    panels = [(m, label) for m, label in FACET_METRICS if m in sub
              and sub[m].notna().any()]
    if not panels:
        return None
    nuts = _nuts_rows(df)
    fig, axes = plt.subplots(2, 2, figsize=(8, 6))
    for ax, (metric, label) in zip(axes.flat, panels):
        order = np.sort(sub[x_col].unique())
        series = ([(None, sub)] if series_col is None
                  else list(sub.groupby(series_col)))
        for si, (sval, g) in enumerate(series):
            stats = (g.groupby(x_col)[metric].agg(['mean', 'std'])
                     .reindex(order))
            xs = np.arange(len(stats))
            ax.errorbar(
                xs, stats['mean'], yerr=stats['std'], marker='o',
                color=C_MCLMC, capsize=0, lw=1.5,
                alpha=1.0 - 0.45 * si,
                ls=['-', '--', ':'][si % 3],
                label=(None if sval is None
                       else f'{series_col.rsplit(".", 1)[-1]}={sval}'))
        ax.set_xticks(np.arange(len(order)))
        ax.set_xticklabels([str(v) for v in order], rotation=45,
                           ha='right', fontsize=8)
        if metric in ('lppd', 'rmse'):
            if len(nuts) and metric in nuts and nuts[metric].notna().any():
                ax.axhline(nuts[metric].mean(), ls='--', color=C_NUTS,
                           lw=1.5, label='avg. NUTS')
            de_col = f'de_{metric}'
            if de_col in df and df[de_col].notna().any():
                ax.axhline(df[de_col].mean(), ls=':', color=C_DE, lw=1.5,
                           label='avg. DE')
            if ax.get_legend_handles_labels()[0]:
                ax.legend(fontsize=7)
        ax.set_ylabel(label, fontsize=9)
    for ax in axes.flat[len(panels):]:
        ax.set_visible(False)
    fig.suptitle(name.replace('_', ' '), fontsize=11)
    return _save(fig, out_dir, name)


# --------------------------------------------------------- architecture
def _n_params(arch: str, n_features: int = 10) -> int:
    try:
        dims = [n_features] + list(ast.literal_eval(str(arch)))
        return sum(a * b + b for a, b in zip(dims[:-1], dims[1:]))
    except (ValueError, SyntaxError):
        return 0


def hidden_structure_figure(df: pd.DataFrame, out_dir: Path) -> str | None:
    """LPPD/RMSE vs architecture, one series per sampler with std
    ribbons, ordered by parameter count (R 468-592)."""
    col = 'model.hidden_structure'
    if col not in df or df[col].dropna().nunique() < 2:
        return None
    sub = df.dropna(subset=[col]).copy()
    order = sorted(sub[col].unique(), key=_n_params)
    metrics = [m for m in ('lppd', 'rmse', 'acc') if m in sub
               and sub[m].notna().any()]
    if not metrics:
        return None
    fig, axes = plt.subplots(1, len(metrics), figsize=(6 * len(metrics), 4),
                             squeeze=False)
    colors = {'mclmc': C_MCLMC, 'nuts': C_NUTS, 'hmc': '#7678ED',
              'de': C_DE}
    # DE runs carry a token mclmc sampler config — classify by name so
    # they plot as their own series (de_lppd is the metric that matters
    # for them), not inside the MCLMC curve
    sub['_method'] = np.where(
        sub.get('experiment_name', pd.Series('', index=sub.index))
           .astype(str).str.contains(r'(?:^|_)de(?:_|$)'),
        'de', sub[SAMPLER_COL].astype(str) if SAMPLER_COL in sub else 'all')
    for ax, metric in zip(axes.flat, metrics):
        for sampler, g in sub.groupby('_method'):
            use_metric = (f'de_{metric}'
                          if sampler == 'de' and f'de_{metric}' in g
                          else metric)
            stats = (g.groupby(col)[use_metric].agg(['mean', 'std'])
                     .reindex(order).dropna(subset=['mean']))
            xs = np.arange(len(stats))
            color = colors.get(str(sampler).lower(), None)
            ax.plot(xs, stats['mean'], marker='o', label=str(sampler),
                    color=color)
            sd = stats['std'].fillna(0.0)
            ax.fill_between(xs, stats['mean'] - sd, stats['mean'] + sd,
                            alpha=0.2, color=color)
            ax.set_xticks(xs)
            ax.set_xticklabels([str(v) for v in stats.index], rotation=45,
                               ha='right', fontsize=8)
        ax.set_ylabel(metric.upper(), fontsize=9)
        ax.set_xlabel('hidden structure (by #params)')
        ax.legend(fontsize=8)
    return _save(fig, out_dir, 'hidden_structure')


# -------------------------------------------------------------- wall-clock
def sampling_times_figure(df: pd.DataFrame, out_dir: Path) -> str | None:
    """Stacked warmstart+sampling seconds per experiment (R 600-692)."""
    cols = [c for c in ('time.warmstart', 'time.sampling') if c in df]
    if not cols or df[cols].notna().sum().sum() == 0:
        return None
    sub = df.dropna(subset=cols, how='all').copy()
    label_col = SAMPLER_COL if SAMPLER_COL in sub else 'experiment_dir'
    labels = [f'{Path(str(d)).name}\n[{s}]' for d, s in zip(
        sub.get('experiment_dir', sub.index), sub.get(label_col, ''))]
    xs = np.arange(len(sub))
    fig, ax = plt.subplots(figsize=(max(6, 0.6 * len(sub)), 4))
    bottom = np.zeros(len(sub))
    for col, color in zip(cols, (C_DE, C_MCLMC)):
        vals = sub[col].fillna(0.0).to_numpy()
        ax.bar(xs, vals, bottom=bottom, label=col.split('.')[1], color=color)
        bottom += vals
    ax.set_xticks(xs)
    ax.set_xticklabels(labels, rotation=45, ha='right', fontsize=7)
    ax.set_ylabel('seconds')
    ax.legend(fontsize=8)
    return _save(fig, out_dir, 'sampling_times')


# -------------------------------------------------------------- grad evals
def grad_evals_figure(df: pd.DataFrame, out_dir: Path) -> str | None:
    """Gradient evaluations per kept draw per sampler (R 850-909). MCLMC
    is 2 grads/draw by construction; NUTS/HMC report measured steps."""
    col = 'mean_num_integration_steps'
    if SAMPLER_COL not in df:
        return None
    sub = df.copy()
    if col not in sub:
        sub[col] = np.nan
    grads = sub[col].copy()
    is_mclmc = sub[SAMPLER_COL].astype(str).str.lower().str.contains('mclmc')
    grads[is_mclmc & grads.isna()] = 2.0  # McLachlan: 2 grads per step
    sub['grads_per_draw'] = grads
    sub = sub.dropna(subset=['grads_per_draw'])
    if not len(sub):
        return None
    stats = sub.groupby(SAMPLER_COL)['grads_per_draw'].agg(['mean', 'std'])
    fig, ax = plt.subplots(figsize=(5, 4))
    xs = np.arange(len(stats))
    ax.bar(xs, stats['mean'], yerr=stats['std'].fillna(0), capsize=4,
           color=[C_MCLMC if 'mclmc' in str(s).lower() else C_NUTS
                  for s in stats.index])
    ax.set_xticks(xs)
    ax.set_xticklabels([str(s) for s in stats.index])
    ax.set_yscale('log')
    ax.set_ylabel('gradient evaluations / kept draw')
    return _save(fig, out_dir, 'grad_evals')


# ------------------------------------------------------------- diagnostics
def diagnostics_figure(df: pd.DataFrame, out_dir: Path) -> str | None:
    """ESS / split-R-hat / BCV / WCV distributions per sampler (R 915-963)."""
    cols = [c for c in ('mean_ess', 'mean_split_rhat', 'mean_bcv',
                        'mean_wcv') if c in df and df[c].notna().any()]
    if not cols:
        return None
    fig, axes = plt.subplots(1, len(cols), figsize=(3.2 * len(cols), 4),
                             squeeze=False)
    for ax, col in zip(axes.flat, cols):
        if SAMPLER_COL in df:
            groups = [(str(s), g[col].dropna().to_numpy())
                      for s, g in df.groupby(SAMPLER_COL)]
        else:
            groups = [('all', df[col].dropna().to_numpy())]
        groups = [(s, v) for s, v in groups if len(v)]
        ax.boxplot([v for _, v in groups],
                   tick_labels=[s for s, _ in groups])
        ax.set_title(col.replace('mean_', ''), fontsize=9)
    return _save(fig, out_dir, 'diagnostics')


# -------------------------------------------------------------- divergences
def divergence_figure(df: pd.DataFrame, out_dir: Path) -> str | None:
    """NUTS divergent-draw counts, by target_acceptance when that axis is
    swept (the nuts_ta study justifying the 0.9 default), else per
    experiment (VERDICT r4 next 5; ref divergence tracking
    src/training/sampling.py:200-216)."""
    ta_col = 'training.sampler.target_acceptance'
    nuts = _nuts_rows(df)
    if 'n_divergent' not in nuts or not nuts['n_divergent'].notna().any():
        return None
    nuts = nuts.dropna(subset=['n_divergent'])
    fig, axes = plt.subplots(1, 2, figsize=(8, 3.6))
    if ta_col in nuts and nuts[ta_col].nunique() >= 2:
        stats = nuts.groupby(ta_col).agg(
            div_mean=('n_divergent', 'mean'), div_std=('n_divergent', 'std'),
            lppd_mean=('lppd', 'mean'), lppd_std=('lppd', 'std'))
        xs = np.arange(len(stats))
        for ax, (m, s, label) in zip(axes, [
                ('div_mean', 'div_std', 'divergent draws / run'),
                ('lppd_mean', 'lppd_std', 'LPPD')]):
            ax.errorbar(xs, stats[m], yerr=stats[s], marker='o',
                        color=C_NUTS, lw=1.5, capsize=3)
            ax.set_xticks(xs)
            ax.set_xticklabels([str(v) for v in stats.index])
            ax.set_xlabel('target acceptance')
            ax.set_ylabel(label, fontsize=9)
        fig.suptitle('NUTS divergences vs target acceptance', fontsize=11)
    else:
        names = nuts['experiment_name'].astype(str).to_numpy()
        axes[0].bar(np.arange(len(nuts)), nuts['n_divergent'],
                    color=C_NUTS)
        axes[0].set_xticks(np.arange(len(nuts)))
        axes[0].set_xticklabels(names, rotation=60, ha='right', fontsize=6)
        axes[0].set_ylabel('divergent draws / run', fontsize=9)
        axes[1].scatter(nuts['n_divergent'], nuts['lppd'], color=C_NUTS,
                        s=14)
        axes[1].set_xlabel('divergent draws')
        axes[1].set_ylabel('LPPD', fontsize=9)
        fig.suptitle('NUTS divergences', fontsize=11)
    fig.tight_layout()
    return _save(fig, out_dir, 'divergences')


# ----------------------------------------------------------------- coverage
def coverage_figure(df: pd.DataFrame, out_dir: Path) -> str | None:
    """Empirical vs nominal central-interval coverage, one line per
    dataset, BDE solid / DE dashed (R 970-1056)."""
    noms = [0.5, 0.75, 0.9, 0.95]
    bde_cols = [f'coverage_{q}' for q in noms]
    if not all(c in df for c in bde_cols):
        return None
    sub = df.dropna(subset=bde_cols)
    if not len(sub):
        return None
    fig, ax = plt.subplots(figsize=(5.5, 5))
    ax.plot([0.4, 1.0], [0.4, 1.0], color='grey', lw=1, ls='-')
    data_col = 'data.path' if 'data.path' in sub else None
    groups = sub.groupby(data_col) if data_col else [('all', sub)]
    for name, g in groups:
        label = Path(str(name)).stem
        ax.plot(noms, [g[c].mean() for c in bde_cols], marker='o',
                label=f'{label} BDE')
        de_cols = [f'de_coverage_{q}' for q in noms]
        if all(c in g for c in de_cols) and g[de_cols].notna().all().all():
            ax.plot(noms, [g[c].mean() for c in de_cols], marker='x',
                    ls='--', label=f'{label} DE')
    ax.set_xlabel('nominal coverage')
    ax.set_ylabel('empirical coverage')
    ax.legend(fontsize=7)
    return _save(fig, out_dir, 'coverage')


# ------------------------------------------------------- generic fallback
def metric_by_axis_figure(df: pd.DataFrame, metric: str, axis: str,
                          out_dir: Path) -> str | None:
    if metric not in df or axis not in df or df[metric].isna().all():
        return None
    sub = df.dropna(subset=[metric])
    if sub[axis].nunique() < 2:
        return None
    fig, ax = plt.subplots(figsize=(7, 4))
    groups = (sub.groupby(SAMPLER_COL) if SAMPLER_COL in sub
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
    safe = f'{metric}_by_{axis}'.replace('.', '_').replace('/', '_')
    return _save(fig, out_dir, safe)


def render_all(df: pd.DataFrame, out_dir: Path) -> list[str]:
    made = []
    for name, (x_col, series_col) in ABLATION_AXES.items():
        made.append(ablation_figure(df, x_col, name, out_dir, series_col))
    made.append(hidden_structure_figure(df, out_dir))
    made.append(sampling_times_figure(df, out_dir))
    made.append(grad_evals_figure(df, out_dir))
    made.append(diagnostics_figure(df, out_dir))
    made.append(divergence_figure(df, out_dir))
    made.append(coverage_figure(df, out_dir))
    for metric in ('lppd', 'de_lppd', 'rmse', 'acc', 'cal_error'):
        for axis in ('data.path', 'rng', 'data.datapoint_limit'):
            made.append(metric_by_axis_figure(df, metric, axis, out_dir))
    return [m for m in made if m]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument('results_csv', type=Path)
    parser.add_argument('-o', '--out_dir', type=Path,
                        default=Path('figures'))
    args = parser.parse_args()
    df = pd.read_csv(args.results_csv)
    made = render_all(df, args.out_dir)
    print(f'wrote {len(made)} figures to {args.out_dir}')
    for m in made:
        print(' ', m)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
