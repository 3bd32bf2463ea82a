"""Parameter priors (reference: /root/reference/src/training/priors.py:14-128).

Priors are iid over all weights, so they're evaluated directly on the FLAT
parameter vector — a single fused VPU reduction on TPU, no pytree traversal
inside the sampler hot loop.
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from mile_tpu.config.training import PriorDist

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


class Prior(NamedTuple):
    """iid prior: init sampler + log density over a flat parameter vector."""

    f_init: Callable  # (key, shape, dtype) -> jax.Array
    log_prior: Callable[[jnp.ndarray], jnp.ndarray]  # flat (dim,) -> scalar
    name: str

    @classmethod
    def from_name(cls, name: PriorDist, **parameters) -> 'Prior':
        loc = float(parameters.get('loc', 0.0))
        scale = float(parameters.get('scale', 1.0))
        if name == PriorDist.STANDARD_NORMAL:
            loc, scale = 0.0, 1.0
        if name in (PriorDist.NORMAL, PriorDist.STANDARD_NORMAL):
            return cls(
                f_init=_normal_init(scale),
                log_prior=_normal_logpdf_sum(loc, scale),
                name=str(name),
            )
        if name == PriorDist.LAPLACE:
            return cls(
                f_init=_laplace_init(loc, scale),
                log_prior=_laplace_logpdf_sum(loc, scale),
                name=str(name),
            )
        raise NotImplementedError(f'prior {name} not implemented')


def _normal_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.normal(key, shape, dtype)

    return init


def _normal_logpdf_sum(loc: float, scale: float):
    def log_prior(theta: jnp.ndarray) -> jnp.ndarray:
        z = (theta - loc) / scale
        return -0.5 * jnp.sum(z * z) - theta.size * (
            _LOG_SQRT_2PI + math.log(scale)
        )

    return log_prior


def _laplace_init(loc: float, scale: float):
    def init(key, shape, dtype=jnp.float32):
        return loc + scale * jax.random.laplace(key, shape, dtype)

    return init


def _laplace_logpdf_sum(loc: float, scale: float):
    def log_prior(theta: jnp.ndarray) -> jnp.ndarray:
        return -jnp.sum(jnp.abs(theta - loc)) / scale - theta.size * math.log(
            2.0 * scale
        )

    return log_prior
