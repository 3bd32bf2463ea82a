"""Cross-chain MCMC diagnostics: ESS, autocovariance, potential scale reduction.

The reference imports ``effective_sample_size`` from BlackJAX (tuner,
/root/reference/src/training/warmup.py:19,458) and from numpyro (metrics,
/root/reference/src/inference/metrics.py:386-405). This is a native,
fully-tensorized implementation (no Python loops over parameters): FFT
autocovariance + Geyer's initial monotone positive sequence, following
Vehtari et al. (2021) / Stan. All reductions are fp32-safe and run on
device, vectorized over arbitrary trailing parameter dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp


def autocovariance(x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Biased sample autocovariance along ``axis`` via FFT.

    ``acov[t] = (1/N) * sum_{i} (x_i - mean)(x_{i+t} - mean)``.
    """
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    centered = x - x.mean(axis=-1, keepdims=True)
    # next power of two >= 2n for linear (non-circular) correlation
    m = _next_pow2(2 * n)
    f = jnp.fft.rfft(centered, n=m, axis=-1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=m, axis=-1)[..., :n] / n
    return jnp.moveaxis(acov, -1, axis)


def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m <<= 1
    return m


def effective_sample_size(samples: jnp.ndarray) -> jnp.ndarray:
    """ESS of ``samples`` with shape (n_chains, n_samples, ...).

    Returns an array of shape ``samples.shape[2:]`` — one ESS per parameter,
    pooled over chains (Stan's multi-chain estimator with Geyer pairing and
    the initial monotone sequence, all implemented with masked tensor ops —
    no data-dependent control flow, so it jits and shards cleanly).
    """
    c, n = samples.shape[0], samples.shape[1]
    acov = autocovariance(samples, axis=1)            # (C, N, ...)
    chain_mean = samples.mean(axis=1)                 # (C, ...)
    mean_acov = acov.mean(axis=0)                     # (N, ...) mean over chains
    chain_var = acov[:, 0, ...] * n / (n - 1.0)       # unbiased per-chain var
    w = chain_var.mean(axis=0)                        # within-chain variance
    if c > 1:
        b_over_n = chain_mean.var(axis=0, ddof=1)     # B/N
        var_plus = w * (n - 1.0) / n + b_over_n
    else:
        var_plus = w * (n - 1.0) / n

    rho = 1.0 - (w - mean_acov) / var_plus            # (N, ...), rho[0] ~ 1

    # Geyer pair sums P_k = rho_{2k} + rho_{2k+1}
    n_pairs = n // 2
    pairs = rho[: 2 * n_pairs].reshape(n_pairs, 2, *rho.shape[1:]).sum(axis=1)
    # initial positive sequence: zero-out from the first non-positive pair on
    positive = jnp.cumprod(pairs > 0.0, axis=0).astype(pairs.dtype)
    pairs = pairs * positive
    # initial monotone sequence: running minimum
    pairs = jnp.minimum.accumulate(pairs, axis=0)
    pairs = jnp.maximum(pairs, 0.0)

    tau = -1.0 + 2.0 * pairs.sum(axis=0)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(float(c * n))))
    ess = c * n / tau
    return jnp.minimum(ess, jnp.asarray(float(c * n)))


def potential_scale_reduction(samples: jnp.ndarray) -> jnp.ndarray:
    """Plain (non-split) R-hat for (n_chains, n_samples, ...) samples."""
    n = samples.shape[1]
    w = samples.var(axis=1, ddof=1).mean(axis=0)
    b_over_n = samples.mean(axis=1).var(axis=0, ddof=1)
    var_plus = w * (n - 1.0) / n + b_over_n
    return jnp.sqrt(var_plus / w)
