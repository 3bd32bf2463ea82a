"""Trainer feature tests: NUTS e2e, keep_warmup, stream_samples, reuse."""
import numpy as np
import pickle
import pytest
import yaml

from mile_tpu.config import Config
from mile_tpu.train.trainer import BDETrainer

BASE = """
saving_dir: '{tmp}'
experiment_name: '{name}'
data:
  path: 'data/airfoil.data'
  task: 'regr'
  train_split: 0.7
  valid_split: 0.1
  test_split: 0.2
model:
  model: FCN
  hidden_structure: [8, 2]
training:
  warmstart:
    include: true
    optimizer_config: {{name: adamw, parameters: {{learning_rate: 0.01}}}}
    max_epochs: 4
    batch_size: 128
  sampler:
    name: '{sampler}'
    warmup_steps: {warmup}
    n_chains: 2
    n_samples: 100
    n_thinning: 2
    step_size_init: 0.01
    {extra}
rng: 0
logging: false
"""


def _cfg(tmp_path, name, sampler='mclmc', warmup=200, extra=''):
    return Config.from_dict(yaml.safe_load(BASE.format(
        tmp=tmp_path, name=name, sampler=sampler, warmup=warmup,
        extra=extra)))


def test_nuts_end_to_end(tmp_path):
    trainer = BDETrainer(_cfg(tmp_path, 'nuts_e2e', sampler='nuts',
                              warmup=150))
    members = trainer.train_warmstart()
    result = trainer.start_sampling(members)
    assert result.samples.shape == (2, 50, trainer.bayes.dim)
    assert np.isfinite(result.samples).all()
    # NUTS info surface matches the reference's info.pkl content
    with open(trainer.samples_dir / 'info.pkl', 'rb') as f:
        info = pickle.load(f)
    for key in ('acceptance_rate', 'is_divergent', 'is_turning', 'energy',
                'num_integration_steps', 'num_trajectory_expansions',
                'step_size', 'inverse_mass_matrix'):
        assert key in info, key
    assert 0.3 < float(np.nanmean(info['acceptance_rate'])) <= 1.0
    metrics = trainer.evaluate(members, result)
    assert np.isfinite(metrics['lppd'])


def test_keep_warmup_saves_trace(tmp_path):
    trainer = BDETrainer(_cfg(tmp_path, 'kw', extra='keep_warmup: true'))
    members = trainer.train_warmstart()
    trainer.start_sampling(members)
    from mile_tpu.train.checkpoint import load_flat_samples

    trace = load_flat_samples(trainer.exp_dir / 'warmup_samples')
    assert trace.shape[0] == 2
    assert trace.shape[1] > 10           # thinned warmup positions kept
    assert trace.shape[2] == trainer.bayes.dim
    assert np.isfinite(trace).all()


def test_stream_samples_parity_layout(tmp_path):
    trainer = BDETrainer(_cfg(tmp_path, 'stream',
                              extra='stream_samples: true'))
    members = trainer.train_warmstart()
    trainer.start_sampling(members)
    # reference layout: samples/{chain}/sample_{n}.npz, one entry per leaf
    files = sorted((trainer.samples_dir / '0').glob('sample_*.npz'))
    assert len(files) == 50
    with np.load(files[0]) as d:
        total = sum(d[k].size for k in d.files)
    assert total == trainer.bayes.dim


def test_warmstart_reuse(tmp_path):
    first = BDETrainer(_cfg(tmp_path, 'src'))
    first.train_warmstart()
    reuse_cfg = _cfg(tmp_path, 'reuse').replace(**{
        'training.warmstart.warmstart_exp_dir': str(first.exp_dir)})
    second = BDETrainer(reuse_cfg)
    params = second.train_warmstart()
    import jax

    from mile_tpu.train.checkpoint import load_params_batch

    src = load_params_batch(first.exp_dir / 'warmstart', [0, 1])
    assert all(
        np.allclose(a, b) for a, b in zip(
            jax.tree.leaves(src), jax.tree.leaves(params)))


def test_warmstart_disabled_random_inits(tmp_path):
    cfg = _cfg(tmp_path, 'nows').replace(
        **{'training.warmstart.include': False})
    trainer = BDETrainer(cfg)
    params = trainer.train_warmstart()
    import jax

    leaves = jax.tree.leaves(params)
    assert leaves[0].shape[0] == 2
    # members are independently initialized (bias leaves are zeros for
    # all members; some kernel leaf must differ)
    assert any(
        not np.allclose(np.asarray(x[0]), np.asarray(x[1])) for x in leaves)


def test_grid_logs_do_not_cross_contaminate(tmp_path):
    """Two sequential experiments in one process each get their own
    training.log (file handlers must not accumulate)."""
    t1 = BDETrainer(_cfg(tmp_path, 'log_a').replace(logging=True))
    t1.train_warmstart()
    t2 = BDETrainer(_cfg(tmp_path, 'log_b').replace(logging=True))
    t2.train_warmstart()
    log_a = (t1.exp_dir / 'training.log').read_text()
    log_b = (t2.exp_dir / 'training.log').read_text()
    # the first log must contain NO lines emitted after the second
    # experiment started
    assert 'log_b' not in log_a
    assert log_a.count('time.warmstart took') == 1
    assert log_b.count('time.warmstart took') == 1


def test_class_count_mismatch_fails_loud(tmp_path):
    """A classification model with fewer outputs than label classes must
    raise at trainer init (silent NaN LPPDs otherwise)."""
    import yaml as _yaml

    cfg = Config.from_dict(_yaml.safe_load(BASE.format(
        tmp=tmp_path, name='mismatch', sampler='mclmc', warmup=200,
        extra='')))
    d = cfg.to_dict()
    d['data']['path'] = 'data/heart_proc.data'   # 5 classes
    d['data']['task'] = 'class'
    d['model']['hidden_structure'] = [8, 2]      # 2-class head
    cfg = Config.from_dict(d)
    with pytest.raises(ValueError, match='classes'):
        BDETrainer(cfg)


def test_checkpoint_sampling_trainer_path(tmp_path):
    """checkpoint_sampling: full pipeline runs, samples persist, and the
    sampler checkpoint is cleaned up on success."""
    cfg = _cfg(tmp_path, 'ckpt_sampling',
               extra='checkpoint_sampling: true')
    trainer = BDETrainer(cfg)
    metrics = trainer.train(report=False)
    assert np.isfinite(metrics['lppd'])
    assert not (trainer.exp_dir / 'sampler_ckpt' / 'sampler_state.npz'
                ).exists()
    assert (trainer.samples_dir / 'chain_0' / 'samples.npy').exists() or \
        any(trainer.samples_dir.glob('chain_*/*'))


def test_profile_flag_writes_trace(tmp_path):
    """config.profile captures a TensorBoard-loadable XLA trace."""
    cfg = _cfg(tmp_path, 'profiled')
    d = cfg.to_dict()
    d['profile'] = True
    cfg = Config.from_dict(d)
    trainer = BDETrainer(cfg)
    trainer.train(report=False)
    trace_files = list((trainer.exp_dir / 'profile').rglob('*'))
    assert any(f.is_file() for f in trace_files)
