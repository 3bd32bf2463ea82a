"""Visualization + results pooling smoke tests."""
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
