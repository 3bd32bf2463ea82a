"""Config framework tests."""
import dataclasses

import pytest
import yaml

from mile_tpu.config import (
    Activation,
    Config,
    ConfigError,
    FCNConfig,
    PriorDist,
    Sampler,
    Task,
)

EXAMPLE = """
saving_dir: '{tmp}/results'
experiment_name: 'mclmc'
data:
  path: 'data/airfoil.data'
  source: 'local'
  data_type: 'tabular'
  task: 'regr'
  target_column: null
  target_len: 1
  features: null
  datapoint_limit: null
  normalize: true
  train_split: 0.7
  valid_split: 0.1
  test_split: 0.2
model:
  model: FCN
  hidden_structure: [16, 16, 2]
  activation: 'relu'
  use_bias: true
training:
  warmstart:
    include: true
    optimizer_config:
      name: 'adamw'
      parameters: {{'learning_rate': 0.001, 'weight_decay': 0.001}}
    warmstart_exp_dir: null
    max_epochs: 500
    batch_size: 32
    patience: 10
  sampler:
    name: 'mclmc'
    warmup_steps: 500
    n_chains: 12
    n_samples: 100
    use_warmup_as_init: true
    diagonal_preconditioning: false
    num_effective_samples: 100
    desired_energy_var_start: 0.5
    desired_energy_var_end: 0.1
    trust_in_estimate: 1.5
    step_size_init: 0.001
    n_thinning: 10
    keep_warmup: false
    prior_config:
      name: 'StandardNormal'
      parameters: {{}}
rng: 4
logging: false
"""


@pytest.fixture
def cfg(tmp_path):
    return Config.from_dict(yaml.safe_load(EXAMPLE.format(tmp=tmp_path)))


def test_reference_yaml_loads(cfg):
    assert isinstance(cfg.model, FCNConfig)
    assert cfg.model.hidden_structure == [16, 16, 2]
    assert cfg.model.activation is Activation.RELU
    assert cfg.data.task is Task.REGRESSION
    assert cfg.training.sampler.name is Sampler.MCLMC
    assert cfg.training.sampler.prior_config.name is PriorDist.STANDARD_NORMAL
    assert cfg.training.warmstart.optimizer_config.parameters['learning_rate'] == 0.001


def test_roundtrip(cfg, tmp_path):
    p = tmp_path / 'cfg.yaml'
    cfg.to_yaml(p)
    cfg2 = Config.from_yaml(p)
    assert cfg == cfg2


def test_unknown_field_rejected(cfg):
    d = cfg.to_dict()
    d['data']['bogus_field'] = 1
    with pytest.raises(ConfigError, match='bogus_field'):
        Config.from_dict(d)


def test_type_error_located(cfg):
    d = cfg.to_dict()
    d['training']['sampler']['n_chains'] = 'twelve'
    with pytest.raises(ConfigError, match='n_chains'):
        Config.from_dict(d)


def test_bad_enum_rejected(cfg):
    d = cfg.to_dict()
    d['training']['sampler']['name'] = 'metropolis'
    with pytest.raises(ConfigError):
        Config.from_dict(d)


def test_unknown_model_rejected(cfg):
    d = cfg.to_dict()
    d['model']['model'] = 'NoSuchNet'
    with pytest.raises(ConfigError, match='NoSuchNet'):
        Config.from_dict(d)


def test_split_validation(cfg):
    d = cfg.to_dict()
    d['data']['train_split'] = 0.9
    with pytest.raises(ConfigError, match='splits'):
        Config.from_dict(d)


def test_replace_dotted(cfg):
    cfg2 = cfg.replace(**{'training.sampler.n_chains': 4, 'rng': 7})
    assert cfg2.training.sampler.n_chains == 4
    assert cfg2.rng == 7
    assert cfg.training.sampler.n_chains == 12  # frozen original


def test_grid_expansion(cfg):
    tree = {'rng': [1, 2, 3], 'model': {'hidden_structure': [[8, 2], [16, 2]]}}
    variants = cfg.expand_grid(tree)
    assert len(variants) == 6
    names = {v.experiment_name for v in variants}
    assert len(names) == 6  # unique experiment names
    assert {v.rng for v in variants} == {1, 2, 3}


def test_random_expansion(cfg):
    tree = {'rng': list(range(20))}
    variants = cfg.expand_random(tree, n=5, seed=0)
    assert len(variants) == 5
    assert len({v.rng for v in variants}) == 5


def test_frozen(cfg):
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.rng = 1


def test_schema():
    s = Config.schema()
    assert 'data' in s and 'model' in s and 'training' in s
    assert 'sampler' in s['training']


def test_sampler_knob_validation():
    from mile_tpu.config.training import SamplerConfig
    from mile_tpu.config.base import ConfigError

    with pytest.raises(ConfigError, match='max_num_doublings'):
        SamplerConfig(max_num_doublings=0)
    with pytest.raises(ConfigError, match='matmul_precision'):
        SamplerConfig(matmul_precision='f32')  # must be 'float32'
    cfg = SamplerConfig(max_num_doublings=6, matmul_precision='float32')
    assert cfg.max_num_doublings == 6
