"""Sampling runtime tests: thinning, chunking, sharding, moments."""
import jax
import jax.numpy as jnp
import numpy as np

from mile_tpu.config.training import SamplerConfig
from mile_tpu.parallel.mesh import chain_mesh
from mile_tpu.train.sampling import run_mclmc

DIM = 10
LOGDENSITY = lambda x: -0.5 * jnp.sum(x * x)


def _positions(n_chains):
    return jax.random.normal(jax.random.PRNGKey(0), (n_chains, DIM))


def test_shapes_thinning_and_moments():
    cfg = SamplerConfig(warmup_steps=800, n_chains=4, n_samples=4000,
                        n_thinning=4, step_size_init=0.05,
                        desired_energy_var_start=1e-3,
                        desired_energy_var_end=1e-3)
    res = run_mclmc(LOGDENSITY, cfg, jax.random.PRNGKey(1), _positions(4))
    assert res.samples.shape == (4, 1000, DIM)
    assert res.tuned['step_size'].shape == (4,)
    assert res.info['energy_change'].shape == (4, 1000)
    pooled = res.samples.reshape(-1, DIM)
    assert abs(float(pooled.mean())) < 0.15
    assert abs(float(pooled.var()) - 1.0) < 0.2


def test_chunked_equals_memory_bounded():
    """Tiny chunk budget: identical shapes, finite draws, sink sees all."""
    cfg = SamplerConfig(warmup_steps=400, n_chains=2, n_samples=600,
                        n_thinning=3, step_size_init=0.05)
    seen = []
    res = run_mclmc(LOGDENSITY, cfg, jax.random.PRNGKey(2), _positions(2),
                    max_chunk_bytes=2 * DIM * 4 * 10,  # 10 kept per chunk
                    sample_sink=lambda chunk, start: seen.append(
                        (start, chunk.shape[1])))
    assert res.samples.shape == (2, 200, DIM)
    assert np.isfinite(res.samples).all()
    assert sum(n for _, n in seen) == 200
    assert seen[0][0] == 0


def test_runs_sharded_on_mesh():
    mesh = chain_mesh()
    cfg = SamplerConfig(warmup_steps=400, n_chains=8, n_samples=200,
                        n_thinning=2, step_size_init=0.05)
    res = run_mclmc(LOGDENSITY, cfg, jax.random.PRNGKey(3), _positions(8),
                    mesh=mesh)
    assert res.samples.shape == (8, 100, DIM)
    assert np.isfinite(res.samples).all()
    # chains are independent: no two identical
    assert not np.allclose(res.samples[0], res.samples[1])
