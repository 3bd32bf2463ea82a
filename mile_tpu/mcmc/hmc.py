"""Hamiltonian Monte Carlo with Metropolis correction.

Reference exposes HMC via BlackJAX (kernel registry,
/root/reference/src/training/kernels/__init__.py:14-20); this is a native
flat-vector implementation: velocity-verlet leapfrog under a diagonal
(inverse) mass matrix, full momentum resampling, MH accept/reject.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from mile_tpu.mcmc.integrators import (
    EuclideanState,
    euclidean_kinetic_energy,
    velocity_verlet,
)


class HMCState(NamedTuple):
    position: jnp.ndarray
    logdensity: jnp.ndarray
    logdensity_grad: jnp.ndarray


class HMCInfo(NamedTuple):
    acceptance_rate: jnp.ndarray
    is_accepted: jnp.ndarray
    energy: jnp.ndarray
    is_divergent: jnp.ndarray
    num_integration_steps: jnp.ndarray


DIVERGENCE_THRESHOLD = 1000.0


def init(position: jnp.ndarray, logdensity_fn: Callable) -> HMCState:
    logdensity, grad = jax.value_and_grad(logdensity_fn)(position)
    return HMCState(position, logdensity, grad)


def sample_momentum(rng_key, dim, inverse_mass_matrix):
    """p ~ N(0, M) with M = diag(1/inverse_mass_matrix)."""
    z = jax.random.normal(rng_key, (dim,))
    return z / jnp.sqrt(inverse_mass_matrix)


def build_kernel(logdensity_fn: Callable,
                 num_integration_steps: int = 32) -> Callable:
    """Return ``step(rng_key, state, step_size, inverse_mass_matrix)``."""

    def step(rng_key, state: HMCState, step_size, inverse_mass_matrix):
        key_mom, key_acc = jax.random.split(rng_key)
        dim = state.position.shape[0]
        p0 = sample_momentum(key_mom, dim, inverse_mass_matrix)
        energy0 = -state.logdensity + euclidean_kinetic_energy(
            p0, inverse_mass_matrix)

        integrate = velocity_verlet(logdensity_fn, inverse_mass_matrix)
        z = EuclideanState(state.position, p0, state.logdensity,
                           state.logdensity_grad)

        def body(_, z):
            return integrate(z, step_size)

        z = jax.lax.fori_loop(0, num_integration_steps, body, z)

        energy1 = -z.logdensity + euclidean_kinetic_energy(
            z.momentum, inverse_mass_matrix)
        delta = energy0 - energy1
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        accept_prob = jnp.minimum(1.0, jnp.exp(delta))
        accept = jax.random.uniform(key_acc) < accept_prob

        new_state = jax.lax.cond(
            accept,
            lambda: HMCState(z.position, z.logdensity, z.logdensity_grad),
            lambda: state)
        info = HMCInfo(
            acceptance_rate=accept_prob,
            is_accepted=accept,
            energy=energy1,
            is_divergent=-delta > DIVERGENCE_THRESHOLD,
            num_integration_steps=jnp.asarray(num_integration_steps),
        )
        return new_state, info

    return step
