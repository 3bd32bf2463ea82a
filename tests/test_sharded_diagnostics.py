"""In-program cross-chain diagnostics over a sharded chain axis.

Demonstrates the SURVEY §7.1 design point: computing pooled diagnostics
under jit on chain-sharded arrays makes XLA insert the cross-device
collectives — no explicit psum/all_gather code.
"""
import jax
import jax.numpy as jnp
import numpy as np

from mile_tpu.inference import metrics as M
from mile_tpu.parallel.mesh import chain_axis_sharding, chain_mesh


def _sharded_samples():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 500, 16)), jnp.float32)
    mesh = chain_mesh()
    return jax.device_put(x, chain_axis_sharding(mesh, x.ndim)), mesh


def test_pooled_diagnostics_on_sharded_chains():
    x, _ = _sharded_samples()
    assert len(x.sharding.device_set) == 8

    @jax.jit
    def diagnostics(samples):
        return (M.pooled_effective_sample_size(samples, rank_normalized=False),
                M.gelman_split_r_hat(samples, 4, rank_normalized=False),
                M.between_chain_var(samples),
                M.within_chain_var(samples))

    ess, rhat, bcv, wcv = jax.block_until_ready(diagnostics(x))
    assert ess.shape == (16,)
    assert np.all(np.asarray(ess) > 1000)        # iid draws
    np.testing.assert_allclose(np.asarray(rhat), 1.0, atol=0.02)
    assert np.all(np.asarray(wcv) > 0)


def test_pooled_lppd_on_sharded_predictions():
    from mile_tpu.config.data import Task

    rng = np.random.default_rng(1)
    preds = jnp.asarray(rng.normal(size=(8, 100, 50, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(50,)), jnp.float32)
    mesh = chain_mesh()
    preds = jax.device_put(preds, chain_axis_sharding(mesh, preds.ndim))

    @jax.jit
    def pooled(preds):
        return M.lppd(M.pointwise_lppd(preds, y, Task.REGRESSION))

    val = float(jax.block_until_ready(pooled(preds)))
    assert np.isfinite(val)


def test_chain_sharded_moments_match_unsharded():
    x, _ = _sharded_samples()
    host = np.asarray(x)

    @jax.jit
    def stats(s):
        return M.between_chain_var(s), M.within_chain_var(s)

    bcv_s, wcv_s = stats(x)
    bcv_h = host.mean(axis=1).var(axis=0, ddof=1)
    np.testing.assert_allclose(np.asarray(bcv_s), bcv_h, rtol=1e-4)
