"""Pallas kernel correctness (interpret mode on CPU; compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mile_tpu.mcmc.integrators import isokinetic_momentum_update
from mile_tpu.ops import isokinetic as ops


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode off-TPU."""
    if jax.default_backend() != 'tpu':
        from jax.experimental import pallas as pl

        real_call = pl.pallas_call

        def interp_call(*args, **kwargs):
            kwargs.setdefault('interpret', True)
            return real_call(*args, **kwargs)

        monkeypatch.setattr(pl, 'pallas_call', interp_call)
        _clear_kernel_caches()
        yield
        _clear_kernel_caches()
    else:
        yield


def _clear_kernel_caches():
    ops._momentum_kernel.cache_clear()
    ops._refresh_kernel.cache_clear()
    ops._batched_momentum_kernel.cache_clear()
    ops._batched_refresh_kernel.cache_clear()


@pytest.mark.parametrize('dim', [64, 674, 2048])
def test_fused_momentum_matches_reference(dim):
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (dim,))
    u = u / jnp.linalg.norm(u)
    g = jax.random.normal(jax.random.PRNGKey(1), (dim,)) * 3.0
    sdc = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (dim,))) + 0.5
    eps = jnp.asarray(0.13)

    ref_u, ref_dk = isokinetic_momentum_update(u, g, eps, sdc)
    pal_u, pal_dk = ops.fused_momentum_update(u, g, eps, sdc)
    np.testing.assert_allclose(np.asarray(pal_u), np.asarray(ref_u),
                               atol=2e-5)
    assert np.isclose(float(pal_dk), float(ref_dk), rtol=2e-4, atol=1e-5)


def test_fused_momentum_zero_gradient():
    dim = 128
    u = jnp.ones(dim) / jnp.sqrt(1.0 * dim)
    new_u, dk = ops.fused_momentum_update(
        u, jnp.zeros(dim), jnp.asarray(0.1), 1.0)
    np.testing.assert_allclose(np.asarray(new_u), np.asarray(u), atol=1e-6)
    assert abs(float(dk)) < 1e-5


@pytest.mark.parametrize('dim', [64, 674])
def test_vmapped_momentum_hits_batched_kernel(dim):
    """vmap over chains must route into the grid-over-chains kernel and
    agree with the per-chain reference math."""
    n_chains = 5
    ku, kg, kc, ks = jax.random.split(jax.random.PRNGKey(3), 4)
    u = jax.random.normal(ku, (n_chains, dim))
    u = u / jnp.linalg.norm(u, axis=1, keepdims=True)
    g = jax.random.normal(kg, (n_chains, dim)) * 2.0
    sdc = jnp.abs(jax.random.normal(kc, (n_chains, dim))) + 0.5
    eps = jnp.abs(jax.random.normal(ks, (n_chains,))) * 0.1 + 0.01

    ref_u, ref_dk = jax.vmap(isokinetic_momentum_update)(u, g, eps, sdc)
    pal_u, pal_dk = jax.vmap(ops.fused_momentum_update)(u, g, eps, sdc)
    np.testing.assert_allclose(np.asarray(pal_u), np.asarray(ref_u),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pal_dk), np.asarray(ref_dk),
                               rtol=2e-4, atol=1e-5)


def test_vmapped_momentum_unbatched_scalars():
    """Per-chain arrays with shared (unbatched) step size/preconditioner."""
    n_chains, dim = 3, 256
    u = jax.random.normal(jax.random.PRNGKey(0), (n_chains, dim))
    u = u / jnp.linalg.norm(u, axis=1, keepdims=True)
    g = jax.random.normal(jax.random.PRNGKey(1), (n_chains, dim))
    eps = jnp.asarray(0.07)

    ref_u, ref_dk = jax.vmap(
        lambda u, g: isokinetic_momentum_update(u, g, eps, 1.0))(u, g)
    pal_u, pal_dk = jax.vmap(
        lambda u, g: ops.fused_momentum_update(u, g, eps, 1.0))(u, g)
    np.testing.assert_allclose(np.asarray(pal_u), np.asarray(ref_u),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pal_dk), np.asarray(ref_dk),
                               rtol=2e-4, atol=1e-5)


def test_vmem_fallback_matches_kernel(monkeypatch):
    """Past _MAX_PADDED the batched rule must switch to vectorized XLA
    math with identical results."""
    monkeypatch.setattr(ops, '_MAX_PADDED', 128)  # force the fallback
    n_chains, dim = 4, 1024
    u = jax.random.normal(jax.random.PRNGKey(0), (n_chains, dim))
    u = u / jnp.linalg.norm(u, axis=1, keepdims=True)
    g = jax.random.normal(jax.random.PRNGKey(1), (n_chains, dim))
    eps = jnp.full((n_chains,), 0.05)
    sdc = jnp.ones((n_chains, dim))
    ref_u, ref_dk = jax.vmap(isokinetic_momentum_update)(u, g, eps, sdc)
    pal_u, pal_dk = jax.vmap(ops.fused_momentum_update)(u, g, eps, sdc)
    np.testing.assert_allclose(np.asarray(pal_u), np.asarray(ref_u),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pal_dk), np.asarray(ref_dk),
                               rtol=2e-4, atol=1e-5)
    # refresh fallback keeps unit norm
    out = jax.vmap(ops.fused_refresh)(
        u, jnp.arange(n_chains, dtype=jnp.int32), eps,
        jnp.ones(n_chains))
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out, axis=1)), 1.0, atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='on-chip PRNG not supported by the interpreter')
def test_vmapped_refresh_statistics():
    """Batched refresh keeps unit norms and gives distinct per-chain noise."""
    n_chains, dim = 6, 674
    u = jax.random.normal(jax.random.PRNGKey(0), (n_chains, dim))
    u = u / jnp.linalg.norm(u, axis=1, keepdims=True)
    eps = jnp.full((n_chains,), 0.1)
    L = jnp.ones(n_chains)
    seeds = jnp.arange(n_chains, dtype=jnp.int32)
    out = jax.vmap(ops.fused_refresh)(u, seeds, eps, L)
    norms = np.asarray(jnp.linalg.norm(out, axis=1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # chains got different noise
    deltas = np.asarray(out - u)
    assert np.std(deltas, axis=1).min() > 0
    corr = np.corrcoef(deltas)
    off_diag = corr[~np.eye(n_chains, dtype=bool)]
    assert np.abs(off_diag).max() < 0.2


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='on-chip PRNG not supported by the interpreter')
def test_fused_refresh_statistics():
    """Refreshed momentum is unit-norm and decorrelates at the right rate."""
    dim = 674
    u = jax.random.normal(jax.random.PRNGKey(0), (dim,))
    u = u / jnp.linalg.norm(u)
    eps, L = jnp.asarray(0.1), jnp.asarray(1.0)

    dots = []
    for seed in range(20):
        new_u = ops.fused_refresh(u, jnp.asarray(seed), eps, L)
        assert np.isclose(float(jnp.linalg.norm(new_u)), 1.0, atol=1e-5)
        dots.append(float(jnp.dot(u, new_u)))
    # E[<u, u'>] ~ 1/sqrt(1 + nu^2 * dim) for small nu
    nu2 = float((jnp.exp(2 * eps / L) - 1.0) / dim)
    expected = 1.0 / np.sqrt(1.0 + nu2 * dim)
    assert abs(np.mean(dots) - expected) < 0.1
    # different seeds -> different refreshes
    assert np.std(dots) > 1e-4
