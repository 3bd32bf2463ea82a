"""Metrics: containers + posterior-predictive and cross-chain statistics.

Reference: /root/reference/src/inference/metrics.py. The heavy diagnostics
(ESS) delegate to the native implementation in
:mod:`mile_tpu.mcmc.diagnostics` (the reference calls numpyro) and are
fully vectorized on device.
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
from flax.struct import PyTreeNode

from mile_tpu.bayes.posterior import SIGMA_MAX, SIGMA_MIN
from mile_tpu.config.data import Task
from mile_tpu.mcmc.diagnostics import effective_sample_size as _ess

# ----------------------------------------------------------- containers


class Metrics(PyTreeNode):
    """Per-step metric traces with shape (n_chains, n_steps)."""

    step: jnp.ndarray

    @property
    def shape(self):
        return self.step.shape

    @property
    def n_chains(self):
        return 1 if len(self.shape) < 2 else self.shape[0]

    def __len__(self):
        return self.shape[-1]

    def __getitem__(self, index):
        if isinstance(index, str):
            return getattr(self, index)
        return self.replace(
            **{k: v[index] for k, v in self.__dict__.items()})

    def pad(self, length: int) -> 'Metrics':
        """NaN-pad the step axis to ``length``."""
        if length <= self.shape[-1]:
            return self
        pad = [(0, 0)] * (len(self.shape) - 1) + [(0, length - self.shape[-1])]
        return self.replace(
            **{k: jnp.pad(v, pad, constant_values=jnp.nan)
               for k, v in self.__dict__.items()})

    @classmethod
    def empty(cls):
        em = jnp.empty((1, 0))
        return cls(**{k: em for k in cls.__dataclass_fields__})

    @property
    def is_empty(self):
        return self.step.size == 0

    @classmethod
    def vstack(cls, metrics: Sequence['Metrics']):
        if not metrics:
            return cls.empty()
        max_len = max(m.shape[-1] for m in metrics)
        metrics = [m.pad(max_len) for m in metrics]
        return cls(**{
            k: jnp.vstack([jnp.atleast_2d(getattr(m, k)) for m in metrics])
            for k in metrics[0].__dict__})

    @classmethod
    def cstack(cls, metrics: Sequence['Metrics']):
        if not metrics:
            return cls.empty()
        return cls(**{
            k: jnp.column_stack([getattr(m, k) for m in metrics])
            for k in metrics[0].__dict__})


class RegressionMetrics(Metrics):
    nlll: jnp.ndarray
    rmse: jnp.ndarray


class ClassificationMetrics(Metrics):
    cross_entropy: jnp.ndarray
    accuracy: jnp.ndarray


class MetricsStore(PyTreeNode):
    """train/valid/test metric bundle with pickle persistence."""

    train: Metrics
    valid: Metrics
    test: Metrics

    def save(self, path: str | Path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, 'wb') as f:
            pickle.dump(jax.device_get(self), f)

    @classmethod
    def load(cls, path: str | Path) -> 'MetricsStore':
        with open(path, 'rb') as f:
            return pickle.load(f)

    @classmethod
    def vstack(cls, stores: Sequence['MetricsStore']):
        first = stores[0]
        return cls(**{
            k: type(getattr(first, k)).vstack([getattr(s, k) for s in stores])
            for k in ('train', 'valid', 'test')})

    def __getitem__(self, key):
        return getattr(self, key)


# ------------------------------------------------------------ pointwise
def pointwise_lppd(lvals: jnp.ndarray, y: jnp.ndarray, task: Task) -> jnp.ndarray:
    """Pointwise log predictive density.

    ``lvals``: (n_chains, n_samples, n_obs, 2) regression heads or
    (..., n_obs, n_classes) logits; lower-rank inputs get leading axes
    added. Returns (n_chains, n_samples, n_obs).
    """
    if lvals.ndim == 3:
        lvals = lvals[None]
    elif lvals.ndim == 2:
        lvals = lvals[None, None]
    if task == Task.REGRESSION:
        mu = lvals[..., 0]
        sigma = jnp.clip(jnp.exp(lvals[..., 1]), SIGMA_MIN, SIGMA_MAX)
        z = (y - mu) / sigma
        return -0.5 * z * z - jnp.log(sigma) - 0.5 * jnp.log(2.0 * jnp.pi)
    if task == Task.CLASSIFICATION:
        log_pmf = lvals - jax.scipy.special.logsumexp(lvals, axis=-1,
                                                      keepdims=True)
        y_idx = jnp.broadcast_to(y, log_pmf.shape[:-1]).astype(jnp.int32)
        return jnp.take_along_axis(log_pmf, y_idx[..., None], axis=-1)[..., 0]
    raise NotImplementedError(task)


def lppd(lppd_pointwise: jnp.ndarray) -> jnp.ndarray:
    """Pooled LPPD: mean over observations of logmeanexp over (chain, sample)."""
    axes = tuple(range(lppd_pointwise.ndim - 1))
    b = 1.0 / jnp.prod(jnp.asarray(lppd_pointwise.shape[:-1]))
    return jax.scipy.special.logsumexp(lppd_pointwise, b=b, axis=axes).mean()


def running_lppd_per_chain(lppd_pointwise: jnp.ndarray) -> jnp.ndarray:
    """Per-chain running LPPD over the sample axis: (n_chains, n_samples)."""
    p = jnp.exp(lppd_pointwise)
    cummean = jnp.cumsum(p, axis=-2) / jnp.arange(
        1, p.shape[-2] + 1)[..., :, None]
    return jnp.log(cummean).mean(axis=-1)


def running_lppd(lppd_pointwise: jnp.ndarray) -> jnp.ndarray:
    """Running LPPD over the sample axis: (n_samples,)."""
    return running_lppd_per_chain(lppd_pointwise).mean(axis=0)


def gaussian_nlll(y: jnp.ndarray, mu: jnp.ndarray, sigma: jnp.ndarray):
    sigma = jnp.clip(sigma, 1e-5)
    return 0.5 * jnp.log(2 * jnp.pi * sigma**2) + (y - mu) ** 2 / (2 * sigma**2)


def squared_error(y: jnp.ndarray, mu: jnp.ndarray):
    return (y - mu) ** 2


# ---------------------------------------------------------- cross-chain
def between_chain_var(x: jnp.ndarray) -> jnp.ndarray:
    """Variance of per-chain means; x: (n_chains, n_samples, ...)."""
    return x.mean(axis=1).var(axis=0, ddof=1)


def within_chain_var(x: jnp.ndarray) -> jnp.ndarray:
    """Mean of per-chain variances; x: (n_chains, n_samples, ...)."""
    return x.var(axis=1, ddof=1).mean(axis=0)


def rank_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Rank-normalize over the pooled (chain, sample) axes.

    x: (n_chains, n_samples, ...) -> same shape, values ~ N(0, 1) ranks
    (Vehtari et al. 2021 fractional offset 3/8). Ranks via double argsort —
    fully vectorized over trailing parameter axes (MCMC draws are
    continuous, so ties are measure-zero).
    """
    shape = x.shape
    flat = x.reshape(-1, *shape[2:])
    n = flat.shape[0]
    ranks = jnp.argsort(jnp.argsort(flat, axis=0), axis=0) + 1.0
    z = jax.scipy.stats.norm.ppf((ranks - 0.375) / (n + 0.25))
    return z.reshape(shape)


def effective_sample_size(x: jnp.ndarray,
                          rank_normalized: bool = True) -> jnp.ndarray:
    """Per-chain ESS (reference semantics, metrics.py:386-405).

    x: (n_chains, n_samples, ...) -> (n_chains, ...): each chain's ESS
    computed independently, after optional rank normalization over the
    pooled draws.
    """
    if rank_normalized:
        x = rank_normalize(x)
    return jax.vmap(lambda chain: _ess(chain[None, ...]))(x)


def pooled_effective_sample_size(x: jnp.ndarray,
                                 rank_normalized: bool = True) -> jnp.ndarray:
    """Multi-chain pooled ESS (shape ``x.shape[2:]``)."""
    if rank_normalized:
        x = rank_normalize(x)
    return _ess(x)


def gelman_split_r_hat(samples: jnp.ndarray, n_splits: int,
                       rank_normalized: bool = True) -> jnp.ndarray:
    """Split-chain R-hat: chains are split into ``n_splits`` segments.

    samples: (n_chains, n_samples, ...) -> R-hat per parameter.
    """
    c, n = samples.shape[0], samples.shape[1]
    if n % n_splits != 0:
        raise ValueError('n_samples must be divisible by n_splits')
    if rank_normalized:
        samples = rank_normalize(samples)
    m = n // n_splits
    splits = samples.reshape(c * n_splits, m, *samples.shape[2:])
    wcv = within_chain_var(splits)
    bcv = between_chain_var(splits)
    return jnp.sqrt(((m - 1.0) / m * wcv + bcv) / wcv)


def split_chain_r_hat(samples: jnp.ndarray, n_splits: int,
                      rank_normalized: bool = True) -> jnp.ndarray:
    """Per-chain split R-hat: (n_chains, ...)."""
    return jnp.stack([
        gelman_split_r_hat(chain[None, ...], n_splits, rank_normalized)
        for chain in samples])
