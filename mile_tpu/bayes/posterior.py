"""Unnormalized log-posterior over flat parameter vectors.

Reference: /root/reference/src/training/probabilistic.py:17-138. Differences
by design:

- The sampler-facing density operates on the FLAT (dim,) parameter vector;
  the pytree structure is applied once via a ``ravel_pytree`` closure. This
  makes every MCMC kernel a pure vector program that vmaps cleanly over a
  chain axis and lets the prior evaluate as one fused reduction.
- A pytree-facing ``log_unnormalized_posterior`` is kept for API parity.
"""
from __future__ import annotations

import logging
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.flatten_util import ravel_pytree

from mile_tpu.bayes.priors import Prior
from mile_tpu.config.data import Task

logger = logging.getLogger(__name__)

# Predictive log-sigma is exp-clipped to this range everywhere
# (reference clip pattern, probabilistic.py:98).
SIGMA_MIN, SIGMA_MAX = 1e-6, 1e6


def gaussian_loglik(lvals: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sum of Normal(y | mean, exp(log_sigma)) log-pdfs.

    ``lvals[..., 0]`` is the mean head, ``lvals[..., 1]`` the log-σ head.
    NaN observations contribute zero (reference ``jnp.nansum`` semantics).
    """
    mu = lvals[..., 0]
    sigma = jnp.clip(jnp.exp(lvals[..., 1]), SIGMA_MIN, SIGMA_MAX)
    z = (y - mu) / sigma
    logpdf = -0.5 * z * z - jnp.log(sigma) - 0.5 * jnp.log(2.0 * jnp.pi)
    return jnp.nansum(logpdf)


def categorical_loglik(lvals: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sum of Categorical(y | logits) log-pmfs."""
    log_pmf = lvals - jax.scipy.special.logsumexp(lvals, axis=-1, keepdims=True)
    picked = jnp.take_along_axis(log_pmf, y[..., None].astype(jnp.int32), axis=-1)
    return jnp.nansum(picked[..., 0])


class BayesianModel:
    """Wraps a Flax module into an unnormalized posterior density."""

    def __init__(
        self,
        module: nn.Module,
        params,  # template ParamTree (defines flat layout)
        prior: Prior,
        task: Task,
        n_batches: int = 1,
        likelihood_chunk_size: int | None = None,
        compute_dtype: jnp.dtype | str | None = None,
    ):
        """``likelihood_chunk_size``: evaluate the log-likelihood in
        rematerialized chunks of this many observations — bounds activation
        memory for full-batch gradients over large datasets (image BNNs)
        at the cost of recomputing forward activations in the backward
        pass (SURVEY §7.4: trade FLOPs for HBM).

        ``compute_dtype`` (e.g. ``'bfloat16'``): run the network forward
        (and hence its MXU matmuls/convs) in this dtype while the
        log-likelihood reduction, prior, and the sampler's energy
        accounting stay float32 (SURVEY §7.4 numerics: bf16 compute,
        fp32 accumulation). The flat parameter vector itself stays
        float32 — casting happens inside the apply."""
        self.module = module
        self.prior = prior
        self.task = task
        self.n_batches = n_batches
        self.likelihood_chunk_size = likelihood_chunk_size
        self.compute_dtype = (jnp.dtype(compute_dtype)
                              if compute_dtype is not None else None)
        flat, unravel = ravel_pytree(params)
        self.dim = int(flat.size)
        self.unravel = unravel
        self.flatten = lambda tree: ravel_pytree(tree)[0]
        logger.info(
            'BayesianModel: task=%s dim=%d prior=%s', task, self.dim, prior.name
        )

    # ------------------------------------------------------------ flat API
    def log_prior(self, theta: jnp.ndarray) -> jnp.ndarray:
        return self.prior.log_prior(theta)

    def _loglik_term(self, lvals, y) -> jnp.ndarray:
        if self.task == Task.REGRESSION:
            return gaussian_loglik(lvals, y)
        if self.task == Task.CLASSIFICATION:
            return categorical_loglik(lvals, y)
        raise NotImplementedError(f'likelihood for {self.task} not implemented')

    def _apply(self, params, x, **kwargs):
        """Module forward in ``compute_dtype`` (if set), outputs float32."""
        if self.compute_dtype is not None:
            params = jax.tree.map(
                lambda a: a.astype(self.compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
            if jnp.issubdtype(x.dtype, jnp.floating):
                x = x.astype(self.compute_dtype)
        lvals = self.module.apply({'params': params}, x, **kwargs)
        return lvals.astype(jnp.float32)

    def log_likelihood(self, theta: jnp.ndarray, x, y, **kwargs) -> jnp.ndarray:
        chunk = self.likelihood_chunk_size
        params = self.unravel(theta)
        if not chunk or x.shape[0] <= chunk:
            lvals = self._apply(params, x, **kwargs)
            return self._loglik_term(lvals, y)

        n = x.shape[0]
        n_full = (n // chunk) * chunk
        xc = x[:n_full].reshape(n // chunk, chunk, *x.shape[1:])
        yc = y[:n_full].reshape(n // chunk, chunk, *y.shape[1:])

        @jax.checkpoint
        def chunk_loglik(xy):
            xb, yb = xy
            return self._loglik_term(self._apply(params, xb, **kwargs), yb)

        total = jnp.sum(jax.lax.map(chunk_loglik, (xc, yc)))
        if n_full < n:  # remainder chunk (static shape)
            total = total + self._loglik_term(
                self._apply(params, x[n_full:], **kwargs), y[n_full:])
        return total

    def log_posterior(self, theta: jnp.ndarray, x, y, **kwargs) -> jnp.ndarray:
        return (
            self.log_prior(theta)
            + self.n_batches * self.log_likelihood(theta, x, y, **kwargs)
        )

    def logdensity_fn(self, x, y, **kwargs) -> Callable[[jnp.ndarray], jnp.ndarray]:
        """Close over the (device-resident) training data → flat density.

        This closure is THE hot function: its value-and-grad is the dominant
        FLOPs of sampling (full-batch forward+backward through the net).
        """

        def logdensity(theta: jnp.ndarray) -> jnp.ndarray:
            return self.log_posterior(theta, x, y, **kwargs)

        return logdensity

    def shard_potential_fn(self, x_shards, y_shards, **kwargs) -> Callable:
        """``U_j(theta)`` for :mod:`mile_tpu.mcmc.split_hmc`.

        ``x_shards``/``y_shards``: device-resident stacked shards with
        leading axis M. Satisfies ``Σ_j U_j = -log_posterior`` on the
        sharded data (the prior is spread 1/M per shard)."""
        n_shards = x_shards.shape[0]

        def shard_potential(theta: jnp.ndarray, j) -> jnp.ndarray:
            xb = jax.lax.dynamic_index_in_dim(x_shards, j, keepdims=False)
            yb = jax.lax.dynamic_index_in_dim(y_shards, j, keepdims=False)
            return -(self.log_likelihood(theta, xb, yb, **kwargs)
                     + self.log_prior(theta) / n_shards)

        return shard_potential

    # ---------------------------------------------------------- pytree API
    def log_unnormalized_posterior(self, position, x, y, **kwargs) -> jnp.ndarray:
        """Pytree-position flavour (reference API parity)."""
        return self.log_posterior(self.flatten(position), x, y, **kwargs)
