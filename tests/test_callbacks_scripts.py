"""Callbacks + experiment scripts tests."""
import numpy as np
import jax
import jax.numpy as jnp


def test_progress_bar_scan(capfd):
    from mile_tpu.train.callbacks import progress_bar_scan

    @progress_bar_scan(n_steps=50, name='scan-test', update_every=10)
    def body(carry, xs):
        step = xs[0]
        return carry + 1, step

    out, _ = jax.lax.scan(body, 0, (jnp.arange(50), jnp.zeros(50)))
    jax.block_until_ready(out)
    assert int(out) == 50
    err = capfd.readouterr().err
    assert 'scan-test' in err and '50/50' in err


def test_io_save_position(tmp_path):
    from mile_tpu.train.callbacks import io_save_position

    tree = {'layer0': {'kernel': jnp.ones((2, 3)), 'bias': jnp.zeros(3)}}

    @jax.jit
    def step(tree):
        return io_save_position(tree, jnp.asarray(1), jnp.asarray(7),
                                tmp_path)

    jax.block_until_ready(step(tree))
    files = list((tmp_path / '1').glob('sample_7.npz'))
    assert len(files) == 1
    with np.load(files[0]) as d:
        assert sum(d[k].size for k in d.files) == 9


def test_plot_results_script(tmp_path):
    import sys

    sys.path.insert(0, 'experiments')
    import pandas as pd
    from plot_results import metric_by_axis_figure

    df = pd.DataFrame({
        'lppd': [-1.0, -1.2, -0.8, -0.9],
        'data.path': ['a', 'a', 'b', 'b'],
        'training.sampler.name': ['mclmc', 'nuts', 'mclmc', 'nuts'],
    })
    assert metric_by_axis_figure(df, 'lppd', 'data.path', tmp_path)
    assert len(list(tmp_path.glob('*.png'))) == 1


def test_preprocess_uci(tmp_path):
    import sys

    sys.path.insert(0, 'experiments')
    from preprocess_uci_class import preprocess

    raw = tmp_path / 'raw'
    raw.mkdir()
    rng = np.random.default_rng(0)
    rows = [','.join([f'{v:.3f}' for v in rng.normal(size=4)]
                     + [rng.choice(['R', 'M'])]) for _ in range(30)]
    (raw / 'sonar.csv').write_text('\n'.join(rows))
    out = preprocess('sonar', raw, tmp_path)
    data = np.genfromtxt(out, delimiter=' ')
    assert data.shape == (30, 5)
    assert set(data[:, -1]) == {0.0, 1.0}
