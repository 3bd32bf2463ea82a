"""Unadjusted Microcanonical Langevin Monte Carlo (MCLMC).

The reference consumes this kernel from BlackJAX
(/root/reference/src/training/warmup.py:522-531); this is a native
implementation: isokinetic McLachlan integration + partial momentum
refresh, single-chain over a flat vector, vmap-lifted over chains.

Algorithm: Robnik & Seljak, "Microcanonical Langevin Monte Carlo" /
"Fluctuation without dissipation" (2023).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from mile_tpu.mcmc.integrators import (
    IntegratorState,
    isokinetic_leapfrog,
    isokinetic_mclachlan,
    partially_refresh_momentum,
)

MCLMCState = IntegratorState


class MCLMCInfo(NamedTuple):
    """Per-step sampling statistics."""

    logdensity: jnp.ndarray
    kinetic_change: jnp.ndarray
    energy_change: jnp.ndarray


def init(
    position: jnp.ndarray,
    logdensity_fn: Callable,
    rng_key: jax.Array,
) -> MCLMCState:
    """Start at ``position`` with a uniformly random unit velocity."""
    logdensity, grad = jax.value_and_grad(logdensity_fn)(position)
    u = jax.random.normal(rng_key, position.shape, position.dtype)
    u = u / jnp.sqrt(jnp.sum(jnp.square(u)))
    return MCLMCState(position, u, logdensity, grad)


def build_kernel(
    logdensity_fn: Callable,
    integrator: str = 'mclachlan',
) -> Callable:
    """Return ``step(rng_key, state, L, step_size, sqrt_diag_cov) -> (state, info)``.

    ``L`` is the momentum-decoherence length; ``step_size`` the integration
    step; ``sqrt_diag_cov`` the diagonal preconditioner. All are runtime
    values and may be per-chain under vmap, so independently tuned chains
    run in one program (the reference gets per-chain params via pmap).
    """
    use_pallas = integrator == 'mclachlan_pallas'
    if use_pallas:
        from mile_tpu.mcmc.integrators import isokinetic_integrator_pallas
        from mile_tpu.ops.isokinetic import fused_refresh

        integrator_step = isokinetic_integrator_pallas(logdensity_fn)

        def refresh(momentum, rng_key, step_size, L):
            # on-chip TPU PRNG, seeded from the step's threefry key
            data = jax.random.key_data(rng_key)
            seed = (data[0] ^ data[-1]).astype(jnp.int32)
            return fused_refresh(momentum, seed, step_size, L)
    else:
        make = (isokinetic_mclachlan if integrator == 'mclachlan'
                else isokinetic_leapfrog)
        integrator_step = make(logdensity_fn)
        refresh = partially_refresh_momentum

    def step(rng_key, state: MCLMCState, L, step_size,
             sqrt_diag_cov: jnp.ndarray | float = 1.0):
        new_state, kinetic_change = integrator_step(state, step_size, sqrt_diag_cov)
        momentum = refresh(new_state.momentum, rng_key, step_size, L)
        new_state = new_state._replace(momentum=momentum)
        energy_change = (
            kinetic_change - new_state.logdensity + state.logdensity
        )
        return new_state, MCLMCInfo(
            logdensity=new_state.logdensity,
            kinetic_change=kinetic_change,
            energy_change=energy_change,
        )

    return step
