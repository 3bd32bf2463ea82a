"""Shared workload for the two-process distributed test: a short vmapped
MCLMC block over a chain mesh, plus one cross-shard reduction.

Kept separate from the worker so the single-process reference run in the
test executes THE SAME code on an 8-virtual-device mesh.
"""
import jax
import jax.numpy as jnp

from mile_tpu.mcmc import mclmc
from mile_tpu.parallel import mesh as pm


def _logdensity(x):
    scales = jnp.linspace(0.5, 2.0, x.shape[0])
    return -0.5 * jnp.sum((x / scales) ** 2)


def run_chains(mesh, n_chains: int = 8, dim: int = 16, n_steps: int = 50):
    """(final positions (n_chains, dim), pooled mean energy scalar).

    Positions are chain-sharded over the (possibly process-spanning) mesh;
    the pooled mean is computed under jit over the sharded axis, so XLA
    inserts a cross-device (and cross-process) reduction.
    """
    kernel = mclmc.build_kernel(_logdensity)

    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)
    init_keys = jax.random.split(jax.random.PRNGKey(1), n_chains)
    positions = jax.vmap(
        lambda k: jax.random.normal(k, (dim,)))(init_keys)

    positions = pm.shard_chains(positions, mesh)
    keys = pm.shard_chains(keys, mesh)

    def chain(key, position):
        state = mclmc.init(position, _logdensity, key)

        def step(state, k):
            state, info = kernel(k, state, jnp.asarray(1.5),
                                 jnp.asarray(0.3), jnp.ones(dim))
            return state, info.energy_change

        state, de = jax.lax.scan(step, state, jax.random.split(key, n_steps))
        return state.position, de

    @jax.jit
    def run(keys, positions):
        pos, de = jax.vmap(chain)(keys, positions)
        # cross-shard reduction: mean over the sharded chain axis
        return pos, jnp.mean(de)

    pos, pooled = run(keys, positions)
    return pos, pooled
