"""Symmetric-split HMC: minibatch (out-of-core) HMC over data shards.

TPU-native counterpart of the reference's external baseline
/root/reference/experiments/symmetric_splitting.py (hamiltorch's
``Integrator.SPLITTING`` on LeNet/FashionMNIST) — the only sampler in
the suite whose gradient never touches the full dataset at once, so it
scales to datasets whose full-batch gradient does not fit the HBM/time
budget of MCLMC/NUTS/HMC.

Math (Strang splitting of the Hamiltonian over data shards; the family
of Neal 2011 §5.1 / Cobb & Jalaian UAI'21): write the potential as
``U(θ) = Σ_{j=1}^M U_j(θ)`` with ``U_j = -(loglik_shard_j + logprior/M)``.
One leapfrog step of size ε is the palindromic composition

    K_1 D K_2 D … K_M D · D K_M D K_{M-1} … D K_1

where ``K_j`` kicks ``p ← p − (ε/2)∇U_j(θ)`` and ``D`` drifts
``θ ← θ + (ε/2M) M⁻¹ p``.  Each shard gradient is used exactly twice
per step (total weight ε, matching the full-data leapfrog), the drift
totals ε, and the sequence is a palindrome of shears — hence
volume-preserving, time-reversible, and a valid MH proposal with
second-order energy error.  Unlike naive stochastic-gradient HMC there
is no gradient noise bias: the composition is an exact symplectic
integrator for an ε-dependent shadow Hamiltonian, and the MH test (full
potential, forward pass only) corrects the rest.

The shard axis is scanned (`lax.scan`) so only one shard's activations
are live at a time; the shard *data* stays device-resident, handed in
by the caller as stacked arrays indexed inside ``shard_potential_fn``.
All tuned scalars are runtime kernel arguments (vmap-liftable per
chain, repo rule).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class SplitHMCState(NamedTuple):
    position: jnp.ndarray    # flat (dim,)
    potential: jnp.ndarray   # U(position) = Σ_j U_j, cached for the MH test


class SplitHMCInfo(NamedTuple):
    acceptance_rate: jnp.ndarray
    is_accepted: jnp.ndarray
    energy: jnp.ndarray
    is_divergent: jnp.ndarray
    num_integration_steps: jnp.ndarray


DIVERGENCE_THRESHOLD = 1000.0


def _full_potential(shard_potential_fn: Callable, n_shards: int,
                    position: jnp.ndarray) -> jnp.ndarray:
    def body(acc, j):
        return acc + shard_potential_fn(position, j), None

    total, _ = jax.lax.scan(body, jnp.zeros((), position.dtype),
                            jnp.arange(n_shards))
    return total


def init(position: jnp.ndarray, shard_potential_fn: Callable,
         n_shards: int) -> SplitHMCState:
    return SplitHMCState(
        position, _full_potential(shard_potential_fn, n_shards, position))


def build_integrator(shard_potential_fn: Callable, n_shards: int
                     ) -> Callable:
    """One palindromic split-leapfrog step:
    ``leapfrog_step(theta, p, step_size, inverse_mass_matrix)``."""
    M = n_shards
    shard_grad = jax.grad(shard_potential_fn)

    def leapfrog_step(theta, p, step_size, inverse_mass_matrix):
        half_kick = 0.5 * step_size
        drift = (step_size / (2.0 * M)) * inverse_mass_matrix

        def fwd(carry, j):
            theta, p = carry
            p = p - half_kick * shard_grad(theta, j)
            theta = theta + drift * p
            return (theta, p), None

        def bwd(carry, j):
            theta, p = carry
            theta = theta + drift * p
            p = p - half_kick * shard_grad(theta, j)
            return (theta, p), None

        (theta, p), _ = jax.lax.scan(fwd, (theta, p), jnp.arange(M))
        (theta, p), _ = jax.lax.scan(bwd, (theta, p),
                                     jnp.arange(M - 1, -1, -1))
        return theta, p

    return leapfrog_step


def build_kernel(shard_potential_fn: Callable, n_shards: int,
                 num_integration_steps: int = 10) -> Callable:
    """Return ``step(rng_key, state, step_size, inverse_mass_matrix)``.

    ``shard_potential_fn(position, j) -> U_j(position)`` must satisfy
    ``Σ_j U_j = -log unnormalized posterior`` (caller folds the 1/M
    prior share into each shard).
    """
    M = n_shards
    leapfrog_step = build_integrator(shard_potential_fn, n_shards)

    def step(rng_key, state: SplitHMCState, step_size,
             inverse_mass_matrix):
        key_mom, key_acc = jax.random.split(rng_key)
        dim = state.position.shape[0]
        p0 = jax.random.normal(key_mom, (dim,)) / jnp.sqrt(
            inverse_mass_matrix)
        kinetic0 = 0.5 * jnp.sum(p0 * p0 * inverse_mass_matrix)
        energy0 = state.potential + kinetic0

        def body(_, carry):
            theta, p = carry
            return leapfrog_step(theta, p, step_size, inverse_mass_matrix)

        theta, p = jax.lax.fori_loop(0, num_integration_steps, body,
                                     (state.position, p0))

        potential1 = _full_potential(shard_potential_fn, M, theta)
        kinetic1 = 0.5 * jnp.sum(p * p * inverse_mass_matrix)
        energy1 = potential1 + kinetic1
        delta = energy0 - energy1
        delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        accept_prob = jnp.minimum(1.0, jnp.exp(delta))
        accept = jax.random.uniform(key_acc) < accept_prob

        new_state = jax.lax.cond(
            accept,
            lambda: SplitHMCState(theta, potential1),
            lambda: state)
        info = SplitHMCInfo(
            acceptance_rate=accept_prob,
            is_accepted=accept,
            energy=energy1,
            is_divergent=-delta > DIVERGENCE_THRESHOLD,
            num_integration_steps=jnp.asarray(num_integration_steps),
        )
        return new_state, info

    return step
