"""Cross-sampler statistical agreement on a real BNN posterior.

MCLMC (unadjusted microcanonical) and NUTS (exact HMC) are entirely
different algorithms sharing only the log-density; agreeing posterior
predictive metrics on the same airfoil BNN is strong evidence both are
correct (the SURVEY §7.4 notion of statistical parity).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mile_tpu.bayes import BayesianModel, Prior
from mile_tpu.config import (
    DataConfig,
    FCNConfig,
    PriorDist,
    Sampler,
    SamplerConfig,
    Task,
)
from mile_tpu.data import TabularLoader
from mile_tpu.inference import metrics as M
from mile_tpu.inference.evaluation import predict_bde
from mile_tpu.models import build_model
from mile_tpu.train.sampling import run_sampler


@pytest.fixture(scope='module')
def posterior():
    data_cfg = DataConfig(path='data/airfoil.data', task=Task.REGRESSION,
                          datapoint_limit=300, train_split=0.7,
                          valid_split=0.1, test_split=0.2)
    loader = TabularLoader(data_cfg, jax.random.PRNGKey(0))
    module = build_model(FCNConfig(hidden_structure=[4, 2]))
    x, y = loader.arrays('train')
    template = module.init(jax.random.PRNGKey(1), x[:1])['params']
    bayes = BayesianModel(module, template,
                          Prior.from_name(PriorDist.STANDARD_NORMAL),
                          Task.REGRESSION)
    return bayes, bayes.logdensity_fn(x, y), loader


def _lppd(bayes, samples, loader):
    x, y = loader.arrays('test')
    preds = predict_bde(bayes.module, bayes.unravel, jnp.asarray(samples), x)
    return float(M.lppd(M.pointwise_lppd(preds, y, Task.REGRESSION)))


def test_mclmc_and_nuts_agree(posterior):
    bayes, logdensity, loader = posterior
    x0 = 0.05 * jax.random.normal(jax.random.PRNGKey(2), (2, bayes.dim))

    mclmc_cfg = SamplerConfig(name=Sampler.MCLMC, warmup_steps=2000,
                              n_chains=2, n_samples=3000, n_thinning=3,
                              step_size_init=0.01,
                              desired_energy_var_start=0.5,
                              desired_energy_var_end=0.1)
    nuts_cfg = SamplerConfig(name=Sampler.NUTS, warmup_steps=400,
                             n_chains=2, n_samples=1000, n_thinning=1,
                             step_size_init=0.1)

    res_m = run_sampler(logdensity, mclmc_cfg, jax.random.PRNGKey(3), x0)
    res_n = run_sampler(logdensity, nuts_cfg, jax.random.PRNGKey(4), x0)

    lppd_m = _lppd(bayes, res_m.samples, loader)
    lppd_n = _lppd(bayes, res_n.samples, loader)
    assert np.isfinite(lppd_m) and np.isfinite(lppd_n)
    # same posterior => same predictive quality within MC error
    assert abs(lppd_m - lppd_n) < 0.25, (lppd_m, lppd_n)

    # posterior log-density levels overlap too
    logp_m = jax.vmap(logdensity)(
        jnp.asarray(res_m.samples[:, 500:].reshape(-1, bayes.dim)))
    logp_n = jax.vmap(logdensity)(
        jnp.asarray(res_n.samples[:, 200:].reshape(-1, bayes.dim)))
    assert abs(float(logp_m.mean()) - float(logp_n.mean())) < \
        3 * float(logp_n.std())
