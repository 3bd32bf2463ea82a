"""ESS / R-hat diagnostics against analytic expectations."""
import jax
import jax.numpy as jnp
import numpy as np

from mile_tpu.mcmc.diagnostics import (
    autocovariance,
    effective_sample_size,
    potential_scale_reduction,
)


def test_autocovariance_matches_numpy():
    x = np.random.default_rng(0).normal(size=(2, 256)).astype(np.float32)
    acov = np.asarray(autocovariance(jnp.asarray(x), axis=1))
    for c in range(2):
        centered = x[c] - x[c].mean()
        expected = np.correlate(centered, centered, mode='full')[255:] / 256
        np.testing.assert_allclose(acov[c], expected, atol=1e-4)


def test_ess_iid_close_to_n():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 1000, 3)), jnp.float32)
    ess = np.asarray(effective_sample_size(x))
    assert ess.shape == (3,)
    assert np.all(ess > 2500), ess  # iid: ESS ~ 4000


def test_ess_ar1_matches_theory():
    rho = 0.9
    rng = np.random.default_rng(2)
    n, c = 20_000, 2
    eps = rng.normal(size=(c, n)) * np.sqrt(1 - rho**2)
    x = np.zeros((c, n))
    x[:, 0] = rng.normal(size=c)
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + eps[:, t]
    ess = float(effective_sample_size(jnp.asarray(x, jnp.float32)[..., None])[0])
    # theory: ESS/N = (1-rho)/(1+rho) = 1/19
    expected = c * n * (1 - rho) / (1 + rho)
    assert 0.6 * expected < ess < 1.6 * expected, (ess, expected)


def test_rhat_mixed_chains_close_to_one():
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(4, 2000, 2)), jnp.float32)
    rhat = np.asarray(potential_scale_reduction(x))
    np.testing.assert_allclose(rhat, 1.0, atol=0.01)


def test_rhat_detects_unmixed_chains():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(4, 500, 1))
    x[0] += 5.0  # one chain stuck elsewhere
    rhat = float(potential_scale_reduction(jnp.asarray(x, jnp.float32))[0])
    assert rhat > 1.5
