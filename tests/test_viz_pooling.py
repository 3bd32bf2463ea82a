"""Visualization + results pooling smoke tests."""
from pathlib import Path

import numpy as np

from mile_tpu import viz
from mile_tpu.inference.metrics import RegressionMetrics, MetricsStore


def _samples():
    rng = np.random.default_rng(0)
    return rng.normal(size=(3, 200, 6)).astype(np.float32)


def test_plots_render(tmp_path):
    s = _samples()
    slices = {'layer0': slice(0, 3), 'layer1': slice(3, 6)}
    figs = [
        viz.plot_param_movement(s),
        viz.plot_param_hist(s),
        viz.plot_pca(s),
        viz.plot_effective_sample_size(s, slices),
        viz.plot_split_chain_r_hat(s, slices),
        viz.plot_variances(s, slices),
        viz.plot_lppd(np.random.default_rng(1).normal(
            size=(3, 200, 10)) - 1.0),
    ]
    for i, fig in enumerate(figs):
        fig.savefig(tmp_path / f'fig{i}.png')
    assert len(list(tmp_path.glob('*.png'))) == len(figs)


def test_warmstart_plot(tmp_path):
    m = RegressionMetrics(
        step=np.tile(np.arange(5), (2, 1)),
        nlll=np.random.rand(2, 5), rmse=np.random.rand(2, 5))
    store = MetricsStore(train=m, valid=m, test=RegressionMetrics.empty())
    fig = viz.plot_warmstart_results(store)
    fig.savefig(tmp_path / 'ws.png')


def test_pool_results(tmp_path):
    import pickle
    import sys

    sys.path.insert(0, 'experiments')
    from pool_results import pool

    for i in range(2):
        d = tmp_path / f'exp{i}'
        d.mkdir()
        (d / 'config.yaml').write_text(
            f'experiment_name: exp{i}\nrng: {i}\n'
            'model:\n  hidden_structure: [8, 2]\n')
        with open(d / 'metrics.pkl', 'wb') as f:
            pickle.dump({'lppd': -1.0 - i, 'rmse': 0.5,
                         'step_size': np.array([0.1, 0.2])}, f)
        (d / 'diagnostics.csv').write_text(
            'layer,ess,bcv,wcv,split_rhat\nl0,100,0.1,0.2,1.01\n')
        (d / 'training.log').write_text(
            'INFO mile_tpu: time.sampling took 3.14 seconds\n')
    df = pool(tmp_path)
    assert len(df) == 2
    assert set(df['lppd']) == {-1.0, -2.0}
    assert abs(df['step_size_mean'].iloc[0] - 0.15) < 1e-6
    assert df['mean_ess'].iloc[0] == 100
    assert df['time.sampling'].iloc[0] == 3.14


def test_pool_reads_sampler_info(tmp_path):
    """Tuned params + per-draw stats pooled from samples/info.pkl."""
    import pickle
    import sys

    sys.path.insert(0, 'experiments')
    from pool_results import pool

    d = tmp_path / 'exp'
    (d / 'samples').mkdir(parents=True)
    (d / 'config.yaml').write_text('experiment_name: exp\nrng: 0\n')
    with open(d / 'samples' / 'info.pkl', 'wb') as f:
        pickle.dump({'step_size': np.array([1e-4, 3e-4]),
                     'L': np.array([1.5, 2.5]),
                     'acceptance_rate': np.array([[0.8, 0.9], [0.7, 0.6]]),
                     'num_integration_steps': np.array([[3, 7], [1, 1]]),
                     'is_divergent': np.array([[1, 0], [0, 0]])}, f)
    df = pool(tmp_path)
    assert abs(df['step_size'].iloc[0] - 2e-4) < 1e-9
    assert abs(df['L'].iloc[0] - 2.0) < 1e-9
    assert abs(df['mean_acceptance_rate'].iloc[0] - 0.75) < 1e-9
    assert df['mean_num_integration_steps'].iloc[0] == 3.0
    assert df['n_divergent'].iloc[0] == 1


def test_paper_figure_families(tmp_path):
    """VERDICT r1 item 10: one command renders the reference R script's
    figure families from a pooled CSV."""
    import sys

    sys.path.insert(0, 'experiments')
    from plot_results import render_all

    import pandas as pd

    rng = np.random.default_rng(0)
    rows = []
    for sampler in ('mclmc', 'nuts'):
        for ev in (0.1, 0.3, 0.5):
            for arch in ('[16, 2]', '[16, 16, 2]'):
                for seed in (0, 1):
                    rows.append({
                        'experiment_dir': f'results/{sampler}_{ev}_{seed}',
                        'training.sampler.name': sampler,
                        'training.sampler.desired_energy_var_end': ev,
                        'training.sampler.num_effective_samples': 100,
                        'training.sampler.warmup_steps': 1000 * (seed + 1),
                        'training.sampler.trust_in_estimate': 1.5,
                        'data.datapoint_limit': 500 * (seed + 1),
                        'data.path': 'data/airfoil.data',
                        'model.hidden_structure': arch,
                        'rng': seed,
                        'lppd': rng.normal(0.5, 0.1),
                        'rmse': rng.normal(0.2, 0.02),
                        'de_lppd': 0.4, 'de_rmse': 0.25,
                        'step_size': rng.uniform(1e-4, 1e-2),
                        'L': rng.uniform(1, 3),
                        'mean_num_integration_steps': (
                            2.0 if sampler == 'mclmc' else 512.0),
                        'mean_ess': rng.uniform(50, 200),
                        'mean_split_rhat': rng.uniform(1.0, 1.2),
                        'mean_bcv': 0.1, 'mean_wcv': 0.05,
                        'time.warmstart': 30.0, 'time.sampling': 60.0,
                        'coverage_0.5': 0.55, 'coverage_0.75': 0.78,
                        'coverage_0.9': 0.9, 'coverage_0.95': 0.94,
                        'de_coverage_0.5': 0.6, 'de_coverage_0.75': 0.8,
                        'de_coverage_0.9': 0.95, 'de_coverage_0.95': 0.97,
                    })
    df = pd.DataFrame(rows)
    made = render_all(df, tmp_path / 'figs')
    names = {str(Path(m).name) for m in made}
    for expected in ('desired_energy_variance.png', 'warmstart_budget.png',
                     'datasize.png', 'hidden_structure.png',
                     'sampling_times.png', 'grad_evals.png',
                     'diagnostics.png', 'coverage.png'):
        assert expected in names, (expected, sorted(names))
    for m in made:
        assert Path(m).stat().st_size > 5000  # non-trivial render
