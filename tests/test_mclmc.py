"""MCLMC kernel correctness on analytic Gaussian targets."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mile_tpu.mcmc import mclmc
from mile_tpu.mcmc.integrators import isokinetic_momentum_update


def _run_chain(logdensity, dim, key, n_steps, step_size, L, x0=None):
    kernel = mclmc.build_kernel(logdensity)
    init_key, run_key = jax.random.split(key)
    x0 = jnp.zeros(dim) if x0 is None else x0
    state = mclmc.init(x0, logdensity, init_key)

    def one_step(state, k):
        state, info = kernel(k, state, L, step_size)
        return state, (state.position, info.energy_change)

    keys = jax.random.split(run_key, n_steps)
    _, (positions, de) = jax.lax.scan(one_step, state, keys)
    return positions, de


def test_momentum_update_stays_on_sphere():
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (64,))
    u = u / jnp.linalg.norm(u)
    g = jax.random.normal(jax.random.PRNGKey(1), (64,))
    new_u, dk = isokinetic_momentum_update(u, g, jnp.array(0.3), 1.0)
    assert np.isclose(float(jnp.linalg.norm(new_u)), 1.0, atol=1e-5)
    assert np.isfinite(float(dk))


def test_momentum_update_rotates_towards_gradient():
    u = jnp.array([1.0, 0.0])
    g = jnp.array([0.0, 10.0])
    new_u, _ = isokinetic_momentum_update(u, g, jnp.array(1.0), 1.0)
    assert float(new_u[1]) > 0.5  # moved towards gradient direction


def test_integrator_second_order():
    """McLachlan is 2nd order: per-step energy error ~ eps^3."""
    dim = 32
    logdensity = lambda x: -0.5 * jnp.sum(x * x)
    key = jax.random.PRNGKey(0)

    def energy_std(eps):
        _, de = _run_chain(logdensity, dim, key, 2000, eps, jnp.sqrt(dim) * 1.0,
                           x0=jax.random.normal(key, (dim,)))
        return float(jnp.std(de[500:]))

    # step sizes large enough that the eps^3 error dominates fp32 noise
    ratio = energy_std(0.8) / energy_std(0.4)
    assert 5.0 < ratio < 12.0, f'expected ~8 (eps^3 scaling), got {ratio}'


def test_standard_gaussian_moments():
    """Long unadjusted run recovers N(0, I) moments within MC error."""
    dim = 20
    logdensity = lambda x: -0.5 * jnp.sum(x * x)
    positions, de = _run_chain(
        logdensity, dim, jax.random.PRNGKey(42), 20_000,
        step_size=0.8, L=jnp.sqrt(1.0 * dim),
    )
    samples = positions[2_000:]
    mean = jnp.mean(samples, axis=0)
    var = jnp.var(samples, axis=0)
    assert float(jnp.max(jnp.abs(mean))) < 0.25
    assert float(jnp.abs(jnp.mean(var) - 1.0)) < 0.1
    assert np.isfinite(np.asarray(de)).all()


def test_anisotropic_gaussian_variances():
    """Recovers per-coordinate variances of a diagonal Gaussian."""
    scales = jnp.array([0.5, 1.0, 2.0, 4.0])
    logdensity = lambda x: -0.5 * jnp.sum((x / scales) ** 2)
    positions, _ = _run_chain(
        logdensity, 4, jax.random.PRNGKey(7), 40_000,
        step_size=0.25, L=jnp.array(5.0),
    )
    var = jnp.var(positions[5_000:], axis=0)
    np.testing.assert_allclose(np.asarray(var), np.asarray(scales) ** 2,
                               rtol=0.35)


def test_vmap_over_chains_with_per_chain_params():
    """The kernel vmaps with per-chain (key, state, L, eps)."""
    dim = 8
    logdensity = lambda x: -0.5 * jnp.sum(x * x)
    kernel = mclmc.build_kernel(logdensity)
    n_chains = 4
    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)
    states = jax.vmap(lambda k: mclmc.init(jnp.zeros(dim), logdensity, k))(keys)
    Ls = jnp.full((n_chains,), 3.0)
    epss = jnp.array([0.05, 0.1, 0.2, 0.4])
    new_states, infos = jax.vmap(kernel)(keys, states, Ls, epss)
    assert new_states.position.shape == (n_chains, dim)
    assert infos.energy_change.shape == (n_chains,)
    # different step sizes => different positions
    assert not jnp.allclose(new_states.position[0], new_states.position[3])
