"""Symplectic / isokinetic integrators over flat parameter vectors.

The reference delegates these to BlackJAX (``blackjax.mcmc.integrators``,
imported at /root/reference/src/training/warmup.py:524-531); here they are
first-class. Everything is written single-chain over a flat ``(dim,)``
vector with scalar step parameters, so ``jax.vmap`` lifts a chain axis and
``jax.sharding`` distributes it — pure VPU code on TPU, with the
``value_and_grad`` of the log-density (the network forward/backward, MXU)
as the only heavy op.

Isokinetic (microcanonical) dynamics: the velocity ``u`` lives on the unit
sphere S^{d-1}. With a fixed gradient g over a time interval h the flow has
the exact solution implemented in :func:`isokinetic_momentum_update`
(the "ESH dynamics" update of Steeg & Galstyan, used by MCLMC —
Robnik, De Luca, Silverstein & Seljak, "Microcanonical Hamiltonian Monte
Carlo", 2022). The returned kinetic-energy change is
``(d-1) * Δr`` where Δr is the log of the normalization factor.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# Minimal-norm (McLachlan) two-stage coefficient.
MCLACHLAN_B1 = 0.1931833275037836


class IntegratorState(NamedTuple):
    """Isokinetic dynamics state for one chain."""

    position: jnp.ndarray        # (dim,)
    momentum: jnp.ndarray        # (dim,) unit vector
    logdensity: jnp.ndarray      # scalar
    logdensity_grad: jnp.ndarray  # (dim,)


def isokinetic_momentum_update(
    momentum: jnp.ndarray,
    gradient: jnp.ndarray,
    step_size: jnp.ndarray,
    sqrt_diag_cov: jnp.ndarray | float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact isokinetic velocity rotation towards the (preconditioned) gradient.

    Returns ``(new_momentum, kinetic_energy_change)``. Numerically stable
    formulation using ``zeta = exp(-delta)`` so large ``delta`` saturates
    instead of overflowing.
    """
    dim = momentum.shape[0]
    g = gradient * sqrt_diag_cov
    g_norm = jnp.sqrt(jnp.sum(jnp.square(g)))
    # avoid 0/0 for flat gradients (guard must stay normal in fp32;
    # subnormals are flushed to zero on some backends); delta=0 => identity
    e = g / jnp.maximum(g_norm, 1e-30)
    ue = jnp.dot(momentum, e)
    delta = step_size * g_norm / (dim - 1)
    zeta = jnp.exp(-delta)
    new_u = e * ((1.0 - zeta) * (1.0 + zeta + ue * (1.0 - zeta))) + 2.0 * zeta * momentum
    new_u_norm = jnp.sqrt(jnp.sum(jnp.square(new_u)))
    new_u = new_u / jnp.maximum(new_u_norm, 1e-30)
    delta_r = delta - jnp.log(2.0) + jnp.log1p(ue + (1.0 - ue) * zeta * zeta)
    return new_u, delta_r * (dim - 1)


def _position_update(
    logdensity_fn: Callable,
    state: IntegratorState,
    step_size: jnp.ndarray,
    sqrt_diag_cov: jnp.ndarray | float,
) -> IntegratorState:
    x = state.position + step_size * state.momentum * sqrt_diag_cov
    logdensity, grad = jax.value_and_grad(logdensity_fn)(x)
    return IntegratorState(x, state.momentum, logdensity, grad)


def isokinetic_integrator(
    logdensity_fn: Callable,
    coefficients: tuple[float, ...] = (MCLACHLAN_B1,),
) -> Callable:
    """Build a palindromic isokinetic integrator step.

    ``coefficients`` are the leading momentum-update fractions; the scheme
    is mirrored to be symmetric. ``(b1,)`` gives the two-stage minimal-norm
    (McLachlan) scheme: v(b1 h), x(h/2), v((1-2 b1) h), x(h/2), v(b1 h).
    ``()`` gives isokinetic leapfrog: v(h/2), x(h), v(h/2).

    ``sqrt_diag_cov`` (the diagonal preconditioner) is a RUNTIME argument so
    adaptation can update it without retracing, and vmap can carry per-chain
    preconditioners.

    Returns ``step(state, step_size, sqrt_diag_cov) -> (state, kinetic_change)``.
    """

    if coefficients == ():
        v_fracs = [0.5, 0.5]
        x_fracs = [1.0]
    else:
        (b1,) = coefficients
        v_fracs = [b1, 1.0 - 2.0 * b1, b1]
        x_fracs = [0.5, 0.5]

    def step(state: IntegratorState, step_size: jnp.ndarray,
             sqrt_diag_cov: jnp.ndarray | float = 1.0):
        kinetic = 0.0
        u, dk = isokinetic_momentum_update(
            state.momentum, state.logdensity_grad, v_fracs[0] * step_size,
            sqrt_diag_cov)
        kinetic += dk
        state = state._replace(momentum=u)
        for xf, vf in zip(x_fracs, v_fracs[1:]):
            state = _position_update(
                logdensity_fn, state, xf * step_size, sqrt_diag_cov)
            u, dk = isokinetic_momentum_update(
                state.momentum, state.logdensity_grad, vf * step_size,
                sqrt_diag_cov)
            kinetic += dk
            state = state._replace(momentum=u)
        return state, kinetic

    return step


def isokinetic_mclachlan(logdensity_fn):
    return isokinetic_integrator(logdensity_fn, (MCLACHLAN_B1,))


def isokinetic_leapfrog(logdensity_fn):
    return isokinetic_integrator(logdensity_fn, ())


def isokinetic_integrator_pallas(
    logdensity_fn: Callable,
    coefficients: tuple[float, ...] = (MCLACHLAN_B1,),
) -> Callable:
    """Same scheme as :func:`isokinetic_integrator`, with the momentum
    rotations executed by the fused Pallas kernel
    (:mod:`mile_tpu.ops.isokinetic`). TPU-only."""
    from mile_tpu.ops.isokinetic import fused_momentum_update

    if coefficients == ():
        v_fracs = [0.5, 0.5]
        x_fracs = [1.0]
    else:
        (b1,) = coefficients
        v_fracs = [b1, 1.0 - 2.0 * b1, b1]
        x_fracs = [0.5, 0.5]

    def step(state: IntegratorState, step_size: jnp.ndarray,
             sqrt_diag_cov: jnp.ndarray | float = 1.0):
        kinetic = 0.0
        u, dk = fused_momentum_update(
            state.momentum, state.logdensity_grad, v_fracs[0] * step_size,
            sqrt_diag_cov)
        kinetic += dk
        state = state._replace(momentum=u)
        for xf, vf in zip(x_fracs, v_fracs[1:]):
            state = _position_update(
                logdensity_fn, state, xf * step_size, sqrt_diag_cov)
            u, dk = fused_momentum_update(
                state.momentum, state.logdensity_grad, vf * step_size,
                sqrt_diag_cov)
            kinetic += dk
            state = state._replace(momentum=u)
        return state, kinetic

    return step


def partially_refresh_momentum(
    momentum: jnp.ndarray,
    rng_key: jax.Array,
    step_size: jnp.ndarray,
    L: jnp.ndarray,
) -> jnp.ndarray:
    """Ornstein-Uhlenbeck-style partial refresh on the sphere.

    The noise scale ``nu = sqrt((e^{2 h/L} - 1)/d)`` sets the momentum
    decoherence length to L.
    """
    dim = momentum.shape[0]
    nu = jnp.sqrt((jnp.exp(2.0 * step_size / L) - 1.0) / dim)
    z = nu * jax.random.normal(rng_key, momentum.shape, momentum.dtype)
    u = momentum + z
    return u / jnp.sqrt(jnp.sum(jnp.square(u)))


# --------------------------------------------------------- euclidean (HMC)
class EuclideanState(NamedTuple):
    position: jnp.ndarray
    momentum: jnp.ndarray
    logdensity: jnp.ndarray
    logdensity_grad: jnp.ndarray


def velocity_verlet(
    logdensity_fn: Callable,
    inverse_mass_matrix: jnp.ndarray,
) -> Callable:
    """Standard leapfrog with diagonal (inverse) mass matrix."""

    def step(state: EuclideanState, step_size: jnp.ndarray) -> EuclideanState:
        p = state.momentum + 0.5 * step_size * state.logdensity_grad
        q = state.position + step_size * inverse_mass_matrix * p
        logdensity, grad = jax.value_and_grad(logdensity_fn)(q)
        p = p + 0.5 * step_size * grad
        return EuclideanState(q, p, logdensity, grad)

    return step


def euclidean_kinetic_energy(
    momentum: jnp.ndarray, inverse_mass_matrix: jnp.ndarray
) -> jnp.ndarray:
    return 0.5 * jnp.sum(jnp.square(momentum) * inverse_mass_matrix)
