"""Nesterov dual averaging for step-size adaptation (Hoffman & Gelman 2014).

Used by the Stan-style window adaptation (the reference gets this from
BlackJAX's ``window_adaptation`` base, /root/reference/src/training/
warmup.py:13,79-82).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class DualAveragingState(NamedTuple):
    log_step_size: jnp.ndarray
    log_step_size_avg: jnp.ndarray
    t: jnp.ndarray
    avg_error: jnp.ndarray
    mu: jnp.ndarray


def da_init(initial_step_size: float | jnp.ndarray,
            mu_factor: float = 10.0) -> DualAveragingState:
    log_eps = jnp.log(jnp.asarray(initial_step_size))
    return DualAveragingState(
        log_step_size=log_eps,
        log_step_size_avg=jnp.asarray(0.0),
        t=jnp.asarray(0.0),
        avg_error=jnp.asarray(0.0),
        mu=jnp.log(mu_factor * jnp.asarray(initial_step_size)),
    )


def da_update(state: DualAveragingState, acceptance_rate: jnp.ndarray,
              target: float = 0.8, t0: float = 10.0, gamma: float = 0.05,
              kappa: float = 0.75) -> DualAveragingState:
    t = state.t + 1.0
    error = target - acceptance_rate
    avg_error = (1.0 - 1.0 / (t + t0)) * state.avg_error + error / (t + t0)
    log_eps = state.mu - jnp.sqrt(t) / gamma * avg_error
    eta = t ** -kappa
    log_eps_avg = eta * log_eps + (1.0 - eta) * state.log_step_size_avg
    return DualAveragingState(log_eps, log_eps_avg, t, avg_error, state.mu)


def da_final(state: DualAveragingState) -> jnp.ndarray:
    """The averaged (smoothed) step size."""
    return jnp.exp(state.log_step_size_avg)
