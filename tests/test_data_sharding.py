"""Data-axis sharding: 2-D (chains, data) mesh over the training set.

SURVEY §7.4: for large datasets the training set stays resident in HBM
sharded over observations; the log-likelihood sum becomes a GSPMD-inserted
psum over the ``data`` mesh axis. Verifies (a) the sharded log-posterior
is numerically equal to the replicated one, (b) the full MCLMC runtime
produces the same draws on a 2-D mesh as on a 1-D chain mesh, and
(c) trainer-level wiring via ``sampler.data_sharding``.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mile_tpu.bayes import BayesianModel, Prior
from mile_tpu.config import FCNConfig, PriorDist, SamplerConfig, Task
from mile_tpu.models import build_model
from mile_tpu.parallel.mesh import (
    chain_data_mesh,
    chain_mesh,
    shard_chains,
    shard_data,
)
from mile_tpu.train.sampling import run_mclmc


def _workload(n_obs=200):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_obs, 5)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(n_obs,)), jnp.float32)
    module = build_model(FCNConfig(hidden_structure=[8, 2]))
    template = module.init(jax.random.PRNGKey(0), x[:1])['params']
    bayes = BayesianModel(module, template,
                          Prior.from_name(PriorDist.STANDARD_NORMAL),
                          Task.REGRESSION)
    return bayes, x, y


def test_sharded_logdensity_matches_replicated():
    bayes, x, y = _workload()
    mesh = chain_data_mesh(4, 2)
    xs, ys = shard_data((x, y), mesh)
    assert 'data' in str(xs.sharding.spec)

    theta = 0.05 * jnp.arange(bayes.dim, dtype=jnp.float32)
    ref_val, ref_grad = jax.value_and_grad(bayes.logdensity_fn(x, y))(theta)
    sh_val, sh_grad = jax.jit(
        jax.value_and_grad(bayes.logdensity_fn(xs, ys)))(theta)
    np.testing.assert_allclose(float(sh_val), float(ref_val), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sh_grad), np.asarray(ref_grad),
                               rtol=1e-4, atol=1e-6)


def test_non_divisible_obs_fall_back_to_replication():
    bayes, x, y = _workload(n_obs=203)
    mesh = chain_data_mesh(4, 2)
    xs, ys = shard_data((x, y), mesh)  # 203 % 2 != 0 -> replicated
    assert 'data' not in str(xs.sharding.spec)
    val = jax.jit(bayes.logdensity_fn(xs, ys))(jnp.zeros(bayes.dim))
    ref = bayes.logdensity_fn(x, y)(jnp.zeros(bayes.dim))
    np.testing.assert_allclose(float(val), float(ref), rtol=1e-5)


def test_run_mclmc_on_chain_data_mesh_matches_chain_mesh():
    bayes, x, y = _workload()
    cfg = SamplerConfig(warmup_steps=30, n_chains=4, n_samples=10,
                        step_size_init=0.01)
    key = jax.random.PRNGKey(1)
    init = jax.vmap(lambda k: 0.1 * jax.random.normal(k, (bayes.dim,)))(
        jax.random.split(jax.random.PRNGKey(2), 4))

    res_1d = run_mclmc(bayes.logdensity_fn(x, y), cfg, key, init,
                       chain_mesh(4))

    mesh = chain_data_mesh(4, 2)
    xs, ys = shard_data((x, y), mesh)
    res_2d = run_mclmc(bayes.logdensity_fn(xs, ys), cfg, key,
                       shard_chains(init, mesh), mesh)

    # identical algorithm; only the reduction order of the log-lik sum
    # differs between the meshes
    np.testing.assert_allclose(res_2d.samples, res_1d.samples,
                               rtol=5e-3, atol=5e-4)


def test_trainer_data_sharding_end_to_end(tmp_path):
    from mile_tpu.config import (
        Config, DataConfig, TrainingConfig, WarmstartConfig)
    from mile_tpu.train.trainer import BDETrainer

    cfg = Config(
        saving_dir=str(tmp_path), experiment_name='ds',
        data=DataConfig(path='data/airfoil.data', task=Task.REGRESSION,
                        datapoint_limit=120, train_split=0.7,
                        valid_split=0.1, test_split=0.2),
        model=FCNConfig(hidden_structure=[4, 2]),
        training=TrainingConfig(
            warmstart=WarmstartConfig(include=True, max_epochs=2,
                                      batch_size=32),
            sampler=SamplerConfig(warmup_steps=20, n_chains=4, n_samples=6,
                                  data_sharding=2, step_size_init=0.01)),
        rng=0)
    trainer = BDETrainer(cfg)
    assert trainer.mesh.axis_names == ('chains', 'data')
    assert trainer.mesh.devices.shape == (4, 2)
    params = trainer.train_warmstart()
    result = trainer.start_sampling(params)
    assert result.samples.shape[:2] == (4, 6)
    assert np.isfinite(result.samples).all()
