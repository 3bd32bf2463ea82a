"""NUTS / HMC correctness on analytic targets."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mile_tpu.config.training import Sampler, SamplerConfig
from mile_tpu.mcmc import hmc, nuts
from mile_tpu.mcmc.adaptation.window import build_schedule
from mile_tpu.mcmc.nuts import _popcount, _trailing_zeros
from mile_tpu.train.sampling_hmc import run_hmc_family


def test_bit_helpers():
    n = jnp.arange(1, 65)
    pc = np.array([bin(i).count('1') for i in range(1, 65)])
    tz = np.array([(i & -i).bit_length() - 1 for i in range(1, 65)])
    np.testing.assert_array_equal(np.asarray(_popcount(n)), pc)
    np.testing.assert_array_equal(np.asarray(_trailing_zeros(n)), tz)


def test_schedule_structure():
    s = build_schedule(1000)
    assert len(s) == 1000
    assert (s[:75] == 0).all()          # initial fast buffer
    assert (s[-50:] == 0).all()         # final fast buffer
    assert (s[75:-50] >= 1).all()       # slow windows
    assert s[99] == 2                   # first 25-window ends at step 99
    assert (s == 2).sum() >= 3          # several window boundaries
    # tiny budget: all fast
    assert (build_schedule(15) == 0).all()


def test_hmc_standard_gaussian():
    dim = 5
    logdensity = lambda x: -0.5 * jnp.sum(x * x)
    kernel = hmc.build_kernel(logdensity, num_integration_steps=16)
    state = hmc.init(jnp.zeros(dim), logdensity)

    def one(carry, key):
        state = carry
        state, info = kernel(key, state, jnp.asarray(0.25), jnp.ones(dim))
        return state, (state.position, info.acceptance_rate)

    keys = jax.random.split(jax.random.PRNGKey(0), 5000)
    _, (xs, acc) = jax.lax.scan(one, state, keys)
    assert float(acc.mean()) > 0.7
    assert abs(float(xs[1000:].mean())) < 0.1
    assert abs(float(xs[1000:].var()) - 1.0) < 0.15


def test_nuts_correlated_gaussian_moments():
    """NUTS with unit mass on a correlated 2d Gaussian."""
    cov = jnp.array([[1.0, 0.8], [0.8, 1.0]])
    prec = jnp.linalg.inv(cov)
    logdensity = lambda x: -0.5 * x @ prec @ x
    kernel = nuts.build_kernel(logdensity)
    state = nuts.init(jnp.zeros(2), logdensity)

    def one(state, key):
        state, info = kernel(key, state, jnp.asarray(0.2), jnp.ones(2))
        return state, (state.position, info)

    keys = jax.random.split(jax.random.PRNGKey(1), 6000)
    _, (xs, infos) = jax.lax.scan(one, state, keys)
    samples = np.asarray(xs[1000:])
    emp_cov = np.cov(samples.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.15)
    assert not np.any(np.asarray(infos.is_divergent))
    # trees actually expand (multi-step trajectories)
    assert float(np.mean(np.asarray(infos.num_integration_steps[1000:]))) > 3


def test_nuts_uses_longer_trajectories_for_anisotropic():
    """Narrow directions force small eps; U-turn criterion should produce
    deeper trees than for the isotropic case."""
    scales = jnp.array([1.0, 10.0])
    logdensity = lambda x: -0.5 * jnp.sum((x / scales) ** 2)
    kernel = nuts.build_kernel(logdensity)
    state = nuts.init(jnp.array([0.5, 5.0]), logdensity)

    def one(state, key):
        state, info = kernel(key, state, jnp.asarray(0.5), jnp.ones(2))
        return state, info.num_trajectory_expansions

    keys = jax.random.split(jax.random.PRNGKey(2), 500)
    _, depths = jax.lax.scan(one, state, keys)
    assert float(depths.mean()) > 2.0


@pytest.mark.parametrize('name', [Sampler.NUTS, Sampler.HMC])
def test_window_adapted_runtime_gaussian(name):
    dim = 8
    scales = jnp.linspace(0.5, 2.0, dim)
    logdensity = lambda x: -0.5 * jnp.sum((x / scales) ** 2)
    n_samples = 2000 if name == Sampler.NUTS else 6000
    cfg = SamplerConfig(name=name, warmup_steps=500, n_chains=2,
                        n_samples=n_samples, n_thinning=2, step_size_init=0.5,
                        num_integration_steps=16)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, dim)) * scales
    res = run_hmc_family(logdensity, cfg, jax.random.PRNGKey(1), x0)
    assert res.samples.shape == (2, n_samples // 2, dim)
    acc = res.info['acceptance_rate']
    assert 0.55 < float(np.nanmean(acc)) <= 1.0
    var = res.samples[:, 200:].reshape(-1, dim).var(axis=0)
    np.testing.assert_allclose(var, np.asarray(scales) ** 2, rtol=0.4)
    # mass matrix learned the scale structure
    imm = res.tuned['inverse_mass_matrix']
    assert imm[:, -1].mean() / imm[:, 0].mean() > 4.0


def test_thin_info_aggregation():
    """VERDICT r1 item 6b: divergences must be counted over the whole thin
    block, not just the last inner step."""
    from mile_tpu.train.sampling_hmc import _aggregate_thin

    infos = {
        'acceptance_rate': jnp.array([0.5, 1.0, 0.75]),
        'is_divergent': jnp.array([True, False, True]),
        'is_turning': jnp.array([False, True, False]),
        'num_integration_steps': jnp.array([3, 7, 1]),
        'energy': jnp.array([1.0, 2.0, 3.0]),
    }
    out = _aggregate_thin(infos)
    assert float(out['acceptance_rate']) == pytest.approx(0.75)
    assert int(out['is_divergent']) == 2          # counted, not sampled
    assert int(out['is_turning']) == 1
    assert int(out['num_integration_steps']) == 11
    assert float(out['energy']) == 3.0            # last-state statistic


def test_window_adaptation_ill_conditioned_bnn_scale():
    """VERDICT r1 item 1 (CPU leg): on a >=500-dim badly-scaled Gaussian,
    window adaptation must (a) not collapse the step size, (b) land near
    the 0.8 acceptance target, and (c) learn the per-coordinate scale
    structure in the mass matrix. Analytic stand-in for the BlackJAX
    cross-check (blackjax is not installed in this image); the target's
    condition number (1e4 in variance) is BNN-like."""
    dim = 512
    rng = np.random.default_rng(0)
    scales = jnp.asarray(
        np.exp(rng.uniform(np.log(1e-1), np.log(10.0), dim)))
    logdensity = lambda x: -0.5 * jnp.sum((x / scales) ** 2)
    cfg = SamplerConfig(name=Sampler.NUTS, warmup_steps=500, n_chains=2,
                        n_samples=100, step_size_init=0.001)
    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, dim)) * scales
    res = run_hmc_family(logdensity, cfg, jax.random.PRNGKey(4), x0)
    acc = float(np.nanmean(res.info['acceptance_rate']))
    assert 0.6 < acc <= 1.0
    eps = np.asarray(res.tuned['step_size'])
    assert (eps > 1e-2).all(), f'step size collapsed: {eps}'
    imm = np.asarray(res.tuned['inverse_mass_matrix'])
    true_var = np.asarray(scales) ** 2
    # log-space agreement per coordinate: the bulk within one decade
    err = np.abs(np.log10(imm / true_var))
    assert np.median(err, axis=1).max() < 1.0


def test_find_reasonable_step_size_brackets_scale():
    """Stan's bracketing search recovers the usable ε scale from seeds that
    are orders of magnitude off, in BOTH directions (VERDICT r1 item 1:
    the ε-collapse came from dual averaging seeded 10-1000x too large on
    sharp full-batch posteriors)."""
    from mile_tpu.mcmc.adaptation.window import find_reasonable_step_size

    dim = 32
    for scale in (1e-3, 1.0, 30.0):
        logdensity = lambda x: -0.5 * jnp.sum((x / scale) ** 2)
        pos = 0.5 * scale * jnp.ones(dim)
        for seed_eps in (1e-6, 1e-3, 1.0, 100.0):
            eps = float(find_reasonable_step_size(
                logdensity, pos, jax.random.PRNGKey(0),
                initial_step_size=seed_eps))
            # one-leapfrog stability boundary for an isotropic Gaussian is
            # eps ~ 2*scale; bracketing must land within ~one decade
            assert 0.05 * scale < eps < 20.0 * scale, (scale, seed_eps, eps)


def test_short_warmup_sharp_posterior_no_collapse():
    """100-step window adaptation on a sharp target from a 500x-too-large
    seed: the r1 failure reproduced in miniature. Bracketing must put dual
    averaging on scale so the short warmup lands near target acceptance."""
    dim = 64
    scale = 1e-3
    logdensity = lambda x: -0.5 * jnp.sum((x / scale) ** 2)
    cfg = SamplerConfig(name=Sampler.NUTS, warmup_steps=100, n_chains=2,
                        n_samples=100, step_size_init=0.5)
    x0 = jax.random.normal(jax.random.PRNGKey(5), (2, dim)) * scale
    res = run_hmc_family(logdensity, cfg, jax.random.PRNGKey(6), x0)
    eps = np.asarray(res.tuned['step_size'])
    assert (eps > 1e-5).all(), f'step size collapsed: {eps}'
    assert (eps < 1e-1).all(), f'step size exploded: {eps}'
    acc = float(np.nanmean(res.info['acceptance_rate']))
    assert 0.5 < acc <= 1.0, acc


def test_nuts_keep_warmup_trace():
    dim = 6
    logdensity = lambda x: -0.5 * jnp.sum(x * x)
    cfg = SamplerConfig(name=Sampler.NUTS, warmup_steps=120, n_chains=2,
                        n_samples=40, n_thinning=2, step_size_init=0.5,
                        keep_warmup=True)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, dim))
    res = run_hmc_family(logdensity, cfg, jax.random.PRNGKey(1), x0)
    trace = res.info['warmup_trace']
    assert trace.shape[0] == 2 and trace.shape[2] == dim
    assert trace.shape[1] >= 100  # thinned warmup positions
    assert np.isfinite(trace).all()


def test_hmc_family_traces_with_f32_matmul_precision():
    """Guard the numerics policy: every dot in the NUTS warmup+sampling
    program must carry Precision.HIGHEST (TPU default-bf16 matmul noise
    otherwise swamps the MH delta-H — measured ~16 logp units on
    bikesharing, docs/DESIGN.md decision 5)."""
    import jax.numpy as jnp

    dim = 8
    w = jnp.eye(dim) * 0.5

    def logdensity(x):
        return -0.5 * jnp.sum((w @ x) ** 2)

    captured = []

    def probe(logdensity_fn, cfg, key, positions, *a, **k):
        def wrapped(x):
            return logdensity_fn(x)

        jaxpr = jax.make_jaxpr(wrapped)(positions[0])
        captured.extend(
            eqn.params.get('precision') for eqn in jaxpr.jaxpr.eqns
            if eqn.primitive.name in ('dot_general', 'conv_general_dilated'))
        raise _Stop()

    class _Stop(Exception):
        pass

    import mile_tpu.train.sampling_hmc as sh

    orig = sh._run_hmc_family
    sh._run_hmc_family = probe
    try:
        cfg = SamplerConfig(name=Sampler.NUTS, warmup_steps=25, n_chains=1,
                            n_samples=4, step_size_init=0.1)
        x0 = jnp.ones((1, dim))
        with pytest.raises(_Stop):
            run_hmc_family(logdensity, cfg, jax.random.PRNGKey(0), x0)
    finally:
        sh._run_hmc_family = orig
    assert captured, 'no matmuls traced'
    assert all(p is not None and 'HIGHEST' in str(p) for p in captured), captured


def test_warmup_depth_cap_runs():
    """warmup_max_num_doublings caps only the window-adaptation trees
    (the round-5 remote-fault mitigation); sampling keeps full depth and
    draws stay finite."""
    import jax
    import jax.numpy as jnp

    from mile_tpu.config import SamplerConfig
    from mile_tpu.config.training import Sampler
    from mile_tpu.train.sampling_hmc import run_hmc_family

    def logdensity(theta):
        return -0.5 * jnp.sum(theta ** 2)

    cfg = SamplerConfig(name=Sampler.NUTS, warmup_steps=30, n_chains=2,
                        n_samples=10, step_size_init=0.5,
                        target_acceptance=0.8, max_num_doublings=10,
                        warmup_max_num_doublings=4)
    pos = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (2, 3))
    res = run_hmc_family(logdensity, cfg, jax.random.PRNGKey(1), pos)
    assert res.samples.shape == (2, 10, 3)
    assert bool(jnp.all(jnp.isfinite(res.samples)))
