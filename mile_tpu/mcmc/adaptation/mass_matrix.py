"""Welford streaming (co)variance for diagonal mass-matrix adaptation."""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class WelfordState(NamedTuple):
    count: jnp.ndarray
    mean: jnp.ndarray
    m2: jnp.ndarray


def welford_init(dim: int) -> WelfordState:
    return WelfordState(
        count=jnp.asarray(0.0),
        mean=jnp.zeros(dim),
        m2=jnp.zeros(dim),
    )


def welford_update(state: WelfordState, value: jnp.ndarray) -> WelfordState:
    count = state.count + 1.0
    delta = value - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (value - mean)
    return WelfordState(count, mean, m2)


def welford_variance(state: WelfordState, regularized: bool = True) -> jnp.ndarray:
    """Sample variance; Stan's shrinkage towards 1e-3 when regularized."""
    var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    if regularized:
        n = state.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var
