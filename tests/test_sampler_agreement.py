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
    loader = TabularLoader(data_cfg, 0)
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


@pytest.mark.slow
def test_bnn_scale_three_sampler_agreement():
    """BNN-scale (≥500-param) cross-sampler guard (VERDICT r2 next 7).

    The r1 ε-collapse regime: a WARMSTARTED (sharp) full-batch BNN
    posterior, short window adaptation. NUTS, HMC and MCLMC must agree
    on posterior-predictive LPPD after their respective adaptations —
    the regression that only surfaced on hardware in r1. CPU, ~5 min.
    """
    import optax

    data_cfg = DataConfig(path='data/airfoil.data', task=Task.REGRESSION,
                          datapoint_limit=400, train_split=0.7,
                          valid_split=0.1, test_split=0.2)
    loader = TabularLoader(data_cfg, 0)
    module = build_model(FCNConfig(hidden_structure=[16, 16, 16, 2]))
    x, y = loader.arrays('train')
    template = module.init(jax.random.PRNGKey(1), x[:1])['params']
    bayes = BayesianModel(module, template,
                          Prior.from_name(PriorDist.STANDARD_NORMAL),
                          Task.REGRESSION)
    assert bayes.dim >= 500
    logdensity = bayes.logdensity_fn(x, y)

    # short full-batch Adam warmstart -> the sharp-posterior regime
    opt = optax.adam(1e-2)
    theta = bayes.flatten(template)

    @jax.jit
    def step(theta, opt_state):
        g = jax.grad(lambda t: -logdensity(t))(theta)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(theta, updates), opt_state

    opt_state = opt.init(theta)
    for _ in range(400):
        theta, opt_state = step(theta, opt_state)
    x0 = theta[None, :] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(2), (2, bayes.dim))

    cfgs = {
        'mclmc': SamplerConfig(name=Sampler.MCLMC, warmup_steps=2000,
                               n_chains=2, n_samples=3000, n_thinning=3,
                               step_size_init=0.01,
                               desired_energy_var_start=0.5,
                               desired_energy_var_end=0.1),
        'nuts': SamplerConfig(name=Sampler.NUTS, warmup_steps=300,
                              n_chains=2, n_samples=300, n_thinning=1,
                              step_size_init=0.005),
        'hmc': SamplerConfig(name=Sampler.HMC, warmup_steps=300,
                             n_chains=2, n_samples=600, n_thinning=1,
                             step_size_init=0.005,
                             num_integration_steps=32),
    }
    lppds, results = {}, {}
    for i, (name, cfg) in enumerate(cfgs.items()):
        res = run_sampler(logdensity, cfg, jax.random.PRNGKey(10 + i), x0)
        results[name] = res
        lppds[name] = _lppd(bayes, res.samples, loader)
    assert all(np.isfinite(v) for v in lppds.values()), lppds

    # ε-collapse signatures (the r1 failure: averaged ε driven orders of
    # magnitude below the usable scale — acceptance pinned ~1.0, NUTS
    # trees saturating max depth, LPPD catastrophically off):
    for name in ('nuts', 'hmc'):
        res = results[name]
        eps = np.asarray(res.tuned['step_size'])
        assert ((eps > 1e-5) & (eps < 0.5)).all(), (name, eps)
        acc = float(np.mean(res.info['acceptance_rate']))
        # dual averaging converged => sampling acceptance near the 0.8
        # target; a collapsed ε pins it at ~1.0, a blown-up ε at ~0.0
        assert 0.55 < acc < 0.97, (name, acc)
        div = float(np.mean(res.info['is_divergent']))
        assert div < 0.2, (name, div)
    # (NUTS trees DO saturate max depth on this anisotropic posterior at
    # healthy ε/acceptance — that is the physics of why NUTS is slow on
    # BNNs, not a collapse signature, so tree size is not asserted)
    # MCLMC energy-variance control engaged (tuned ε on a sane scale)
    eps_m = np.asarray(results['mclmc'].tuned['step_size'])
    assert ((eps_m > 1e-4) & (eps_m < 10.0)).all(), eps_m

    # catastrophe-only quality band: at these CI budgets the exact
    # samplers mix toward the broad posterior while MCLMC stays nearer
    # the warmstart mode (measured gap ~0.5-0.7); the r1 collapse class
    # produces multi-unit gaps on top of the signature failures above
    spread = max(lppds.values()) - min(lppds.values())
    assert spread < 1.0, lppds
