"""Shared type aliases and protocols (reference: /root/reference/src/types.py)."""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Protocol, Union

import jax
import jax.numpy as jnp

# A (possibly nested) tree of parameter arrays.
ParamTree = Union[dict, Any]

# PRNG key array.
PRNGKey = jax.Array

# Unnormalized log-posterior over a flat parameter vector.
PosteriorFunction = Callable[[jnp.ndarray], jnp.ndarray]


class State(NamedTuple):
    """Minimal sampler state: current position."""

    position: jnp.ndarray


class Kernel(Protocol):
    """One MCMC transition: (key, state, *tuned) -> (state, info)."""

    def __call__(self, rng_key: PRNGKey, state, *parameters):
        ...


class Runner(Protocol):
    """A warmup/sampling routine run per chain."""

    def __call__(self, rng_key: PRNGKey, position: jnp.ndarray, *args):
        ...


class GradEstimator(Protocol):
    """Mini-batch gradient estimator protocol (reserved; full-batch is the
    supported path, as in the reference — src/types.py:66-80)."""

    def __call__(self, position: jnp.ndarray, x: jnp.ndarray,
                 y: jnp.ndarray) -> jnp.ndarray:
        ...


WarmupResult = tuple  # (warmup_state, tuned_parameters)
