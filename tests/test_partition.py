"""Partition mode tests: masks, optimizers, subspace sampling, e2e."""
import jax
import jax.numpy as jnp
import numpy as np
import yaml

from mile_tpu.bayes import partition as part
from mile_tpu.config import Config, FCNConfig
from mile_tpu.models import build_model


def _template(hidden=(8, 8, 8, 2), n_in=5):
    model = build_model(FCNConfig(hidden_structure=list(hidden)))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, n_in)))['params']
    return model, params


def test_layer_groups_ordered():
    _, params = _template()
    groups = part.layer_groups(params)
    names = [g[0] for g in groups]
    assert names == ['fcn/layer0', 'fcn/layer1', 'fcn/layer2', 'fcn/layer3']
    # contiguous, full coverage
    assert groups[0][1] == 0
    for (_, _, e), (_, s, _) in zip(groups, groups[1:]):
        assert e == s


def test_partition_mask_first_last():
    _, params = _template()
    from jax.flatten_util import ravel_pytree

    flat, _ = ravel_pytree(params)
    mask = part.partition_mask(params, flat.size)
    groups = part.layer_groups(params)
    # layer0 (5*8+8=48) + layer3 (8*2+2=18) sampled
    assert mask.sum() == 48 + 18
    assert mask[groups[0][1]:groups[0][2]].all()
    assert mask[groups[-1][1]:groups[-1][2]].all()
    assert not mask[groups[1][1]:groups[2][2]].any()


def test_partition_optimizer_freezes_hidden():
    import optax

    model, params = _template()
    tx = part.partition_optimizer(optax.sgd(0.1), params)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.abs(updates['fcn']['layer1']['kernel']).max()) == 0.0
    assert float(jnp.abs(updates['fcn']['layer0']['kernel']).max()) > 0.0


def test_partitioned_logdensity_and_merge():
    logdensity = lambda t: -0.5 * jnp.sum(t * t)
    mask = np.array([True, False, True, False])
    pld = part.make_partitioned_logdensity(logdensity, mask)
    base = jnp.array([9.0, 1.0, 9.0, 2.0])
    z = jnp.array([3.0, 4.0])
    # merged = [3, 1, 4, 2]
    assert np.isclose(float(pld(z, base)), -0.5 * (9 + 1 + 16 + 4))
    merged = part.merge(base[None], z[None, None], mask)
    np.testing.assert_array_equal(merged[0, 0], [3.0, 1.0, 4.0, 2.0])


def test_partition_sampling_e2e(tmp_path):
    cfg = Config.from_dict(yaml.safe_load(f"""
saving_dir: '{tmp_path}'
experiment_name: 'part'
data:
  path: 'data/airfoil.data'
  task: 'regr'
  train_split: 0.7
  valid_split: 0.1
  test_split: 0.2
model:
  model: PartitionFCN
  hidden_structure: [8, 8, 2]
training:
  warmstart:
    include: true
    optimizer_config: {{name: adamw, parameters: {{learning_rate: 0.01}}}}
    max_epochs: 5
    batch_size: 128
    partition_warmstart: true
  sampler:
    name: mclmc
    warmup_steps: 300
    n_chains: 2
    n_samples: 200
    n_thinning: 2
    partition_sampling: true
    step_size_init: 0.01
rng: 0
logging: false
"""))
    from mile_tpu.train.trainer import BDETrainer

    trainer = BDETrainer(cfg)
    members = trainer.train_warmstart()
    result = trainer.start_sampling(members)
    # merged back to full dimension
    assert result.samples.shape == (2, 100, trainer.bayes.dim)
    mask = part.partition_mask(trainer._template, trainer.bayes.dim)
    frozen = result.samples[:, :, ~mask]
    # frozen coords identical across draws
    assert np.allclose(frozen, frozen[:, :1, :])
    sampled = result.samples[:, :, mask]
    assert not np.allclose(sampled[:, 0], sampled[:, -1])
    metrics = trainer.evaluate(members, result)
    assert np.isfinite(metrics['lppd'])
