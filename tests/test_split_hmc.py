"""Symmetric-split HMC: integrator properties and posterior correctness.

The splitting must be (a) time-reversible (palindrome of shears),
(b) an exact-volume MH proposal, (c) statistically correct — the chain
must recover an analytic conjugate-Gaussian posterior.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mile_tpu.mcmc import split_hmc

DIM = 3
N_OBS = 64
M_SHARDS = 4
SIGMA = 0.5


def _make_problem(seed=0):
    """y_i ~ N(theta, SIGMA^2 I), prior theta ~ N(0, I). Conjugate."""
    rng = np.random.default_rng(seed)
    theta_true = rng.normal(size=DIM)
    y = theta_true + SIGMA * rng.normal(size=(N_OBS, DIM))
    shards = jnp.asarray(y.reshape(M_SHARDS, N_OBS // M_SHARDS, DIM),
                         dtype=jnp.float32)

    def shard_potential(theta, j):
        ys = jax.lax.dynamic_index_in_dim(shards, j, keepdims=False)
        loglik = -0.5 * jnp.sum((ys - theta) ** 2) / SIGMA**2
        logprior_share = -0.5 * jnp.sum(theta**2) / M_SHARDS
        return -(loglik + logprior_share)

    precision = 1.0 + N_OBS / SIGMA**2
    post_mean = (y.sum(axis=0) / SIGMA**2) / precision
    return shard_potential, post_mean, 1.0 / precision


def test_full_potential_matches_direct_sum():
    shard_potential, _, _ = _make_problem()
    theta = jnp.arange(DIM, dtype=jnp.float32) * 0.3
    state = split_hmc.init(theta, shard_potential, M_SHARDS)
    direct = sum(float(shard_potential(theta, j)) for j in range(M_SHARDS))
    assert np.isclose(float(state.potential), direct, rtol=1e-5)


def test_integrator_is_reversible():
    """Running the palindromic step from (theta', -p') must return to
    (theta, -p) — the property that makes the MH kernel exact."""
    shard_potential, _, _ = _make_problem()
    leapfrog = split_hmc.build_integrator(shard_potential, M_SHARDS)
    theta0 = jnp.asarray(np.random.default_rng(1).normal(size=DIM),
                         jnp.float32)
    p0 = jnp.asarray(np.random.default_rng(2).normal(size=DIM), jnp.float32)
    eps, inv_mass = jnp.float32(5e-3), jnp.ones(DIM, jnp.float32)

    theta, p = theta0, p0
    for _ in range(7):
        theta, p = leapfrog(theta, p, eps, inv_mass)
    back_t, back_p = theta, -p
    for _ in range(7):
        back_t, back_p = leapfrog(back_t, back_p, eps, inv_mass)
    np.testing.assert_allclose(np.asarray(back_t), np.asarray(theta0),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(-back_p), np.asarray(p0),
                               atol=1e-4)


def test_small_step_acceptance_near_one():
    shard_potential, _, _ = _make_problem()
    kernel = split_hmc.build_kernel(shard_potential, M_SHARDS,
                                    num_integration_steps=5)
    state = split_hmc.init(jnp.zeros(DIM, jnp.float32), shard_potential,
                           M_SHARDS)
    inv_mass = jnp.ones(DIM, jnp.float32)
    rates = []
    for i in range(10):
        state, info = kernel(jax.random.PRNGKey(i), state,
                             jnp.float32(1e-3), inv_mass)
        rates.append(float(info.acceptance_rate))
    assert np.mean(rates) > 0.98


def test_recovers_conjugate_posterior():
    shard_potential, post_mean, post_var = _make_problem()
    kernel = split_hmc.build_kernel(shard_potential, M_SHARDS,
                                    num_integration_steps=8)
    # inverse mass ~ posterior variance so trajectories are well scaled
    inv_mass = jnp.full(DIM, 1.0 / (1.0 + N_OBS / SIGMA**2), jnp.float32)
    state = split_hmc.init(jnp.zeros(DIM, jnp.float32), shard_potential,
                           M_SHARDS)

    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def run(state, key, n):
        def one(state, k):
            state, info = kernel(k, state, jnp.float32(0.25), inv_mass)
            return state, (state.position, info.is_accepted)

        return jax.lax.scan(one, state, jax.random.split(key, n))

    state, _ = run(state, jax.random.PRNGKey(0), 200)            # burn
    _, (draws, accepted) = run(state, jax.random.PRNGKey(1), 1500)
    draws = np.asarray(draws)
    assert np.asarray(accepted).mean() > 0.5
    se_mean = np.sqrt(post_var / 1500) * 6 + 0.02
    np.testing.assert_allclose(draws.mean(axis=0), post_mean, atol=se_mean)
    np.testing.assert_allclose(draws.var(axis=0), post_var,
                               rtol=0.5)
