"""End-to-end pipeline test: airfoil FCN + MCLMC (SURVEY §7.3 minimum slice).

Small budgets so it runs in CI, but exercises every phase: config → loader
→ warmstart ensemble → per-chain MCLMC tuning → sharded sampling →
evaluation → artifacts → report.
"""
import pickle

import numpy as np
import pytest
import yaml

from mile_tpu.config import Config
from mile_tpu.train.trainer import BDETrainer

CFG = """
saving_dir: '{tmp}'
experiment_name: 'e2e'
data:
  path: 'data/airfoil.data'
  source: 'local'
  data_type: 'tabular'
  task: 'regr'
  normalize: true
  train_split: 0.7
  valid_split: 0.1
  test_split: 0.2
model:
  model: FCN
  hidden_structure: [8, 8, 2]
  activation: 'relu'
training:
  warmstart:
    include: true
    optimizer_config:
      name: 'adamw'
      parameters: {{'learning_rate': 0.01, 'weight_decay': 0.001}}
    max_epochs: 15
    batch_size: 64
    patience: 5
  sampler:
    name: 'mclmc'
    warmup_steps: 400
    n_chains: 4
    n_samples: 400
    n_thinning: 4
    desired_energy_var_start: 0.5
    desired_energy_var_end: 0.1
    step_size_init: 0.01
    prior_config:
      name: 'StandardNormal'
rng: 0
logging: true
"""


@pytest.fixture(scope='module')
def run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('e2e')
    cfg = Config.from_dict(yaml.safe_load(CFG.format(tmp=tmp)))
    trainer = BDETrainer(cfg)
    metrics = trainer.train(report=True)
    return trainer, metrics


def test_metrics_sane(run):
    trainer, metrics = run
    # BDE should be a usable predictor: LPPD in a plausible range for
    # z-normalized airfoil (reference results are around -0.5 .. -1.5)
    assert -5.0 < metrics['lppd'] < 0.5, metrics['lppd']
    assert 0.0 < metrics['rmse'] < 1.5, metrics['rmse']
    assert np.isfinite(metrics['de_lppd'])
    assert 'cal_error' in metrics
    assert metrics['coverage_0.95'] >= metrics['coverage_0.5']


def test_artifacts_written(run):
    trainer, _ = run
    d = trainer.exp_dir
    assert (d / 'config.yaml').exists()
    assert (d / 'warmstart' / 'params_0.npz').exists()
    assert (d / 'warmstart' / 'tree').exists()
    chain0 = d / 'samples' / 'chain_0'
    assert ((chain0 / 'samples.npy').exists()
            or (chain0 / 'samples.bin').exists())  # native-sink layout
    assert (d / 'warmup_params.txt').exists()
    assert (d / 'metrics.pkl').exists()
    assert (d / 'report.html').exists()
    assert (d / 'diagnostics.csv').exists()
    with open(d / 'metrics.pkl', 'rb') as f:
        m = pickle.load(f)
    assert m['step_size'].shape == (4,)
    # wall-times are merged into metrics.pkl at report time (the reference
    # notebook's cell-4 contract)
    assert m['time.warmstart'] > 0 and m['time.sampling'] > 0


def test_samples_shape_and_diversity(run):
    trainer, _ = run
    from mile_tpu.train.checkpoint import load_flat_samples

    samples = load_flat_samples(trainer.exp_dir / 'samples')
    assert samples.shape == (4, 100, trainer.bayes.dim)
    assert np.isfinite(samples).all()
    # chains explore different regions (independent warmstart inits)
    assert not np.allclose(samples[0], samples[1])
    # within a chain, consecutive draws differ (sampler is moving)
    assert not np.allclose(samples[0, 0], samples[0, -1])


def test_diagnostics_csv_parses(run):
    trainer, _ = run
    lines = (trainer.exp_dir / 'diagnostics.csv').read_text().strip().split('\n')
    assert lines[0].startswith('layer,ess')
    assert len(lines) > 1


def test_times_logged(run):
    trainer, _ = run
    log = (trainer.exp_dir / 'training.log').read_text()
    assert 'time.warmstart took' in log
    assert 'time.sampling took' in log


def test_standalone_report_recomputes_metrics(run):
    """VERDICT r1 item 2: generate_report on a dir WITHOUT metrics.pkl must
    rebuild loader/model from config.yaml and recompute the DE + BDE
    evaluation from warmstart + samples alone (reference notebook
    workflow, inference.ipynb cells 18-24)."""
    trainer, orig_metrics = run
    d = trainer.exp_dir
    (d / 'metrics.pkl').unlink()
    (d / 'report.html').unlink()

    from mile_tpu.inference.reporting import generate_report

    out = generate_report(d)  # no config, no trainer state
    assert out.exists() and out.stat().st_size > 1000
    with open(d / 'metrics.pkl', 'rb') as f:
        m = pickle.load(f)
    for key in ('lppd', 'rmse', 'de_lppd', 'cal_error', 'coverage_0.95',
                'running_lppd'):
        assert key in m, key
    # recomputation must reproduce the in-run evaluation (same samples,
    # same test split, deterministic eval keys)
    assert m['lppd'] == pytest.approx(orig_metrics['lppd'], abs=1e-4)
    assert m['rmse'] == pytest.approx(orig_metrics['rmse'], abs=1e-4)
    assert 'lppd' in (d / 'report.html').read_text()
