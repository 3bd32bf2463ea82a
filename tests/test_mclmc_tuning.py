"""MCLMC adaptation tests on Gaussian targets."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mile_tpu.mcmc import mclmc
from mile_tpu.mcmc.adaptation.mclmc_tuning import (
    MCLMCTuningParams,
    TuningConfig,
    mclmc_tune,
)

DIM = 16


@pytest.fixture(scope='module')
def gauss():
    return lambda x: -0.5 * jnp.sum(x * x)


def _tune(gauss, cfg, key=0, n_chains=1):
    keys = jax.random.split(jax.random.PRNGKey(key), n_chains)
    x0 = jax.random.normal(jax.random.PRNGKey(key + 1), (n_chains, DIM))
    states, params = jax.vmap(
        lambda p, k: mclmc_tune(gauss, p, k, cfg)
    )(x0, keys)
    return states, params


def test_tuned_energy_variance_near_target(gauss):
    target = 5e-4
    cfg = TuningConfig(warmup_steps=2000, desired_energy_var_start=target,
                       desired_energy_var_end=target, step_size_init=0.05)
    state, params = _tune(gauss, cfg)
    eps = float(params.step_size[0])
    L = float(params.L[0])
    assert eps > 0 and np.isfinite(eps)
    assert L > 0 and np.isfinite(L)

    # run the tuned kernel; measured Var[dE]/dim should be near target
    kernel = mclmc.build_kernel(gauss)
    st = jax.tree.map(lambda x: x[0], state)

    def one(st, k):
        st, info = kernel(k, st, params.L[0], params.step_size[0],
                          params.sqrt_diag_cov[0])
        return st, info.energy_change

    _, de = jax.lax.scan(one, st, jax.random.split(jax.random.PRNGKey(9), 3000))
    measured = float(jnp.var(de)) / DIM
    assert target / 5 < measured < target * 5, (measured, target)


def test_tuned_sampler_recovers_moments(gauss):
    cfg = TuningConfig(warmup_steps=2000, desired_energy_var_start=1e-3,
                       desired_energy_var_end=1e-3, step_size_init=0.05)
    state, params = _tune(gauss, cfg)
    kernel = mclmc.build_kernel(gauss)
    st = jax.tree.map(lambda x: x[0], state)

    def one(st, k):
        st, _ = kernel(k, st, params.L[0], params.step_size[0],
                       params.sqrt_diag_cov[0])
        return st, st.position

    _, xs = jax.lax.scan(one, st, jax.random.split(jax.random.PRNGKey(3), 20_000))
    var = jnp.var(xs[2000:], axis=0)
    mean = jnp.mean(xs[2000:], axis=0)
    assert float(jnp.max(jnp.abs(mean))) < 0.35
    assert abs(float(jnp.mean(var)) - 1.0) < 0.15


def test_preconditioning_estimates_scales():
    scales = jnp.concatenate([jnp.full(8, 0.5), jnp.full(8, 3.0)])
    logdensity = lambda x: -0.5 * jnp.sum((x / scales) ** 2)
    cfg = TuningConfig(warmup_steps=6000, diagonal_preconditioning=True,
                       desired_energy_var_start=1e-3,
                       desired_energy_var_end=1e-3, step_size_init=0.05)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (DIM,)) * scales
    _, params = mclmc_tune(logdensity, x0, jax.random.PRNGKey(1), cfg)
    sdc = np.asarray(params.sqrt_diag_cov)
    # preconditioner should reflect the factor-6 scale split
    assert sdc[8:].mean() / sdc[:8].mean() > 2.0
    assert float(params.L) > 0


def test_per_chain_params_differ(gauss):
    cfg = TuningConfig(warmup_steps=1000, step_size_init=0.05)
    _, params = _tune(gauss, cfg, n_chains=4)
    assert params.step_size.shape == (4,)
    # chains see different randomness => slightly different tuned values
    assert len(set(np.asarray(params.step_size).tolist())) > 1


def test_nan_guard_recovers():
    """A density with a cliff produces non-finite proposals early on;
    tuning must still return finite parameters."""
    def cliff(x):
        return jnp.where(jnp.sum(x * x) < 100.0,
                         -0.5 * jnp.sum(x * x),
                         -jnp.inf)

    cfg = TuningConfig(warmup_steps=1000, step_size_init=10.0)  # absurd init
    x0 = jnp.zeros(DIM)
    state, params = mclmc_tune(cliff, x0, jax.random.PRNGKey(0), cfg)
    assert np.isfinite(float(params.step_size))
    assert np.all(np.isfinite(np.asarray(state.position)))


def test_knob_sweep_shares_one_program():
    """Numeric tuning knobs are runtime args: different grid values must
    lower to the IDENTICAL XLA program, so hyper-parameter sweeps reuse
    one (persistent-cached) compile instead of paying a fresh remote
    tuner compile per value (round-3 catalogue requirement)."""
    logd = lambda x: -0.5 * jnp.sum(x * x)  # noqa: E731
    pos = jnp.zeros((2, 8)) + 0.1
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    cfg = TuningConfig(warmup_steps=60)

    def hlo(**knobs):
        rt = TuningConfig(warmup_steps=60, **knobs).runtime()
        f = jax.jit(jax.vmap(
            lambda p, k, rt: mclmc_tune(logd, p, k, cfg, rt),
            in_axes=(0, 0, None)))
        return f.lower(pos, keys, rt).as_text()

    base = hlo()
    assert hlo(trust_in_estimate=3.0, desired_energy_var_start=100.0,
               desired_energy_var_end=0.01, step_size_init=0.5,
               num_effective_samples=10) == base
