"""Posterior-predictive evaluation for DE and BDE models.

Reference: /root/reference/src/inference/evaluation.py. The reference
forward-passes samples in a PYTHON LOOP (evaluation.py:37-43, noted as a
hot spot in SURVEY §3.5); here prediction is ``vmap`` over the (chain,
sample) axes of FLAT sample matrices under jit — one batched program,
chunked over samples to bound memory.
"""
from __future__ import annotations

import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mile_tpu.config.data import Task
from mile_tpu.inference import metrics as M

logger = logging.getLogger(__name__)


# ------------------------------------------------------------- prediction
#: default byte budget for transient prediction memory (reference notebook
#: cell 21 uses the same 4 GB cap: /root/reference/src/inference/inference.ipynb)
DEFAULT_EVAL_MEMORY_BUDGET = 4 * 1024 ** 3


def make_predictor(module, unravel) -> Callable:
    """jitted (theta, x) -> model outputs, for flat parameter vectors."""

    @jax.jit
    def predict(theta: jnp.ndarray, x: jnp.ndarray):
        return module.apply({'params': unravel(theta)}, x)

    return predict


def _jaxpr_bytes(jaxpr) -> int:
    """Sum of all equation-output aval sizes, recursing into sub-jaxprs."""
    total = 0
    for eqn in jaxpr.eqns:
        sub = []
        for p in eqn.params.values():
            for item in (p if isinstance(p, (list, tuple)) else [p]):
                if hasattr(item, 'eqns'):
                    sub.append(item)
                elif hasattr(item, 'jaxpr') and hasattr(item.jaxpr, 'eqns'):
                    sub.append(item.jaxpr)
        if sub:
            total += sum(_jaxpr_bytes(s) for s in sub)
        else:
            for v in eqn.outvars:
                aval = getattr(v, 'aval', None)
                shape = getattr(aval, 'shape', None)
                if shape is not None:
                    total += (int(np.prod(shape, dtype=np.int64))
                              * np.dtype(aval.dtype).itemsize)
    return total


def unit_activation_bytes(module, unravel, dim: int, x) -> int:
    """Activation bytes for ONE flat sample applied to ONE observation.

    Traces the un-vmapped apply abstractly and sums every intermediate
    array — the per-(sample, obs) memory cost of the vmapped predictor.
    Pre-XLA-fusion, so it over-estimates what the compiler materializes:
    conservative in the safe direction. TPU-native replacement for the
    reference's host-side pickle-size heuristic
    (/root/reference/src/inference/inference.ipynb cell 21).
    """
    theta = jax.ShapeDtypeStruct((dim,), jnp.float32)
    x1 = jax.ShapeDtypeStruct((1,) + tuple(x.shape[1:]), x.dtype)
    try:
        jaxpr = jax.make_jaxpr(
            lambda t, xx: module.apply({'params': unravel(t)}, xx))(theta, x1)
    except Exception:  # exotic modules may resist abstract tracing
        logger.warning('could not trace model for memory planning; '
                       'falling back to unchunked observations')
        return 0
    return _jaxpr_bytes(jaxpr.jaxpr)


def plan_eval_chunks(module, unravel, dim: int, x, n_samples: int,
                     sample_batch: int = 256,
                     memory_budget_bytes: int = DEFAULT_EVAL_MEMORY_BUDGET,
                     ) -> tuple[int, int]:
    """(sample_chunk, obs_chunk) such that the vmapped predict's transient
    activations fit ``memory_budget_bytes``.

    Shrinks the observation axis first (keeping the vmapped sample axis
    wide keeps matmuls large for the MXU); only if a single observation
    still blows the budget does the sample axis shrink too. Reference
    batches over observations only (evaluation.py:334-406).
    """
    n_obs = int(x.shape[0])
    s_chunk = max(1, min(sample_batch, n_samples))
    unit = unit_activation_bytes(module, unravel, dim, x)
    if unit <= 0:
        return s_chunk, n_obs
    obs_chunk = int(memory_budget_bytes // (s_chunk * unit))
    if obs_chunk < 1:
        s_chunk = max(1, int(memory_budget_bytes // unit))
        obs_chunk = 1
    obs_chunk = min(obs_chunk, n_obs)
    if obs_chunk < n_obs or s_chunk < min(sample_batch, n_samples):
        logger.info(
            'evaluation chunked to %d samples x %d observations '
            '(%.1f KiB activations per sample-obs, %.2f GiB budget)',
            s_chunk, obs_chunk, unit / 1024,
            memory_budget_bytes / 1024 ** 3)
    return s_chunk, obs_chunk


def predict_from_flat(module, unravel, flat_samples: jnp.ndarray,
                      x: jnp.ndarray, sample_batch: int = 256,
                      memory_budget_bytes: int = DEFAULT_EVAL_MEMORY_BUDGET,
                      ) -> jnp.ndarray:
    """(S, dim) flat samples -> (S, B, out) predictions.

    vmapped over samples under jit, chunked over BOTH the sample and the
    observation axes so transient activations stay within
    ``memory_budget_bytes`` (reference batches observations from a 4 GB
    heuristic: inference.ipynb cell 21 + evaluation.py:334-406).
    """
    n_samples, dim = flat_samples.shape
    s_chunk, obs_chunk = plan_eval_chunks(
        module, unravel, dim, x, n_samples, sample_batch,
        memory_budget_bytes)

    @jax.jit
    def batch_predict(thetas, xb):
        # metrics are energy-like quantities: keep matmuls exact f32 so
        # LPPD/RMSE don't inherit the TPU's default-bf16 matmul noise
        with jax.default_matmul_precision('float32'):
            return jax.vmap(
                lambda t: module.apply({'params': unravel(t)}, xb))(thetas)

    outs = []
    for i in range(0, n_samples, s_chunk):
        thetas = flat_samples[i:i + s_chunk]
        if obs_chunk >= x.shape[0]:
            outs.append(batch_predict(thetas, x))
        else:
            obs_outs = [batch_predict(thetas, x[j:j + obs_chunk])
                        for j in range(0, x.shape[0], obs_chunk)]
            outs.append(jnp.concatenate(obs_outs, axis=1))
    return jnp.concatenate(outs, axis=0)


def predict_bde(module, unravel, samples: jnp.ndarray, x: jnp.ndarray,
                sample_batch: int = 256,
                memory_budget_bytes: int = DEFAULT_EVAL_MEMORY_BUDGET,
                ) -> jnp.ndarray:
    """(C, S, dim) samples -> (C, S, B, out); chains×samples flattened into
    one vmapped axis so small chains don't underutilize the device."""
    c, s, dim = samples.shape
    flat = samples.reshape(c * s, dim)
    preds = predict_from_flat(module, unravel, flat, x, sample_batch,
                              memory_budget_bytes)
    return preds.reshape(c, s, *preds.shape[1:])


def sample_from_predictions(predictions: jnp.ndarray, task: Task,
                            rng_key: jax.Array) -> jnp.ndarray:
    """Draw point predictions from the predictive distribution."""
    if task == Task.REGRESSION:
        loc = predictions[..., 0]
        scale = jnp.clip(jnp.exp(predictions[..., 1]), 1e-6, 1e6)
        return loc + scale * jax.random.normal(rng_key, loc.shape)
    return jax.random.categorical(rng_key, logits=predictions)


# ------------------------------------------------------------ calibration
def calibration_error(nominal, observed, weights=None) -> jnp.ndarray:
    nominal, observed = jnp.asarray(nominal), jnp.asarray(observed)
    sq = jnp.square(nominal - observed)
    if weights is not None:
        sq = weights * sq
    return jnp.sqrt(jnp.mean(sq))


def calculate_coverage(nominal_coverages, y: jnp.ndarray,
                       preds: jnp.ndarray) -> jnp.ndarray:
    """Empirical coverage of central credible intervals.

    ``preds``: sampled point predictions (n_chains, n_samples, N).
    """
    flat = preds.reshape(-1, preds.shape[-1])
    out = []
    for cov in nominal_coverages:
        lo, hi = 0.5 - cov / 2, 0.5 + cov / 2
        qs = jnp.quantile(flat, jnp.array([lo, hi]), axis=0)
        out.append(jnp.mean((qs[0] <= y) & (y <= qs[1])))
    return jnp.array(out)


def _majority_vote(draws: np.ndarray, axis: tuple) -> np.ndarray:
    """Mode over the given leading axes of integer class draws."""
    draws = np.asarray(draws)
    moved = np.moveaxis(draws, axis, tuple(range(len(axis))))
    flat = moved.reshape(-1, *moved.shape[len(axis):])  # (votes, N)
    n_classes = int(flat.max()) + 1
    one_hot = np.eye(n_classes, dtype=np.int64)[flat]   # (votes, N, K)
    return one_hot.sum(axis=0).argmax(axis=-1)


# -------------------------------------------------------------- evaluation
def evaluate_bde(
    module,
    unravel,
    samples: jnp.ndarray,        # (C, S, dim) flat samples
    x: jnp.ndarray,
    y: jnp.ndarray,
    task: Task,
    rng_key: jax.Array = None,
    nominal_coverages: Optional[list] = None,
    sample_batch: int = 256,
    metrics_dict: Optional[dict] = None,
    verbose: bool = True,
    memory_budget_bytes: int = DEFAULT_EVAL_MEMORY_BUDGET,
) -> tuple[jnp.ndarray, dict]:
    """Pooled + per-chain posterior-predictive metrics.

    Returns (predictions (C,S,B,out), metrics dict with lppd/nll/rmse|acc,
    per-chain lists, coverage + calibration for regression).
    """
    metrics_dict = dict(metrics_dict or {})
    rng_key = jax.random.PRNGKey(42) if rng_key is None else rng_key
    preds = predict_bde(module, unravel, jnp.asarray(samples), x, sample_batch,
                        memory_budget_bytes)

    # NaN-chain exclusion (reference evaluation.py:493-497)
    nan_chains = np.asarray(jnp.isnan(preds).any(axis=tuple(range(1, preds.ndim))))
    if nan_chains.any() and not nan_chains.all():
        logger.warning('chains %s have NaN predictions; excluding',
                       np.where(nan_chains)[0])
        ok = ~nan_chains
    else:
        ok = np.ones(preds.shape[0], dtype=bool)

    pw = M.pointwise_lppd(preds[ok], y, task)
    metrics_dict['lppd'] = float(M.lppd(pw))
    metrics_dict['nll'] = float(-pw.mean())
    # running LPPD over the NaN-filtered chains only — one NaN chain must
    # not NaN the whole curve (reference computes it post-filter too,
    # evaluation.py:493-497 + metrics.py:428-446)
    metrics_dict['running_lppd'] = np.asarray(M.running_lppd(pw))
    # per-chain curves for the report's LPPD-vs-samples family
    # (reference notebook cell 22 / visualization/samples.py:280-318)
    metrics_dict['running_lppd_per_chain'] = np.asarray(
        M.running_lppd_per_chain(pw))
    per_chain = [float(M.lppd(M.pointwise_lppd(p, y, task))) for p in preds]
    metrics_dict['lppd_per_chain'] = per_chain

    # function-space mixing diagnostics: R-hat/ESS over the predictive
    # mean (class-0 logit for classification). For multimodal BNN weight
    # posteriors, function-space mixing is the operative convergence
    # measure (weight-space R-hat is expected to be large when chains sit
    # in different modes — see the MILE paper's diagnostics discussion).
    fs = preds[ok, ..., 0]
    n_even = fs.shape[1] - (fs.shape[1] % 4)
    if n_even >= 8 and fs.shape[0] > 1:
        metrics_dict['fs_split_rhat'] = float(jnp.nanmean(
            M.gelman_split_r_hat(fs[:, :n_even], n_splits=4)))
        # per-chain ESS: within-chain decorrelation (what matters for an
        # ensemble of chains pooled by logmeanexp); the pooled multi-chain
        # estimator would mostly measure between-mode disagreement
        metrics_dict['fs_ess_per_chain'] = float(jnp.nanmean(
            M.effective_sample_size(fs[:, :n_even])))
        metrics_dict['fs_ess'] = float(jnp.nanmean(
            M.pooled_effective_sample_size(fs[:, :n_even])))

    point = sample_from_predictions(preds, task, rng_key)
    if task == Task.REGRESSION:
        mean_pred = preds[ok, ..., 0].mean(axis=(0, 1))
        metrics_dict['rmse'] = float(jnp.sqrt(jnp.mean((y - mean_pred) ** 2)))
        if nominal_coverages:
            coverage = calculate_coverage(nominal_coverages, y, point[ok])
            metrics_dict['cal_error'] = float(
                calibration_error(jnp.array(nominal_coverages), coverage))
            for c, v in zip(nominal_coverages, coverage):
                metrics_dict[f'coverage_{c}'] = float(v)
    else:
        vote = _majority_vote(np.asarray(point[ok]), axis=(0, 1))
        metrics_dict['acc'] = float(np.mean(np.asarray(y) == vote))

    if verbose:
        key = 'rmse' if task == Task.REGRESSION else 'acc'
        logger.info('BDE | LPPD: %.3f, %s: %.4f',
                    metrics_dict['lppd'], key.upper(), metrics_dict[key])
    return preds, metrics_dict


def evaluate_de(
    module,
    params,                      # member-stacked ParamTree
    x: jnp.ndarray,
    y: jnp.ndarray,
    task: Task,
    rng_key: jax.Array = None,
    n_samples: int = 0,
    nominal_coverages: Optional[list] = None,
    metrics_dict: Optional[dict] = None,
    verbose: bool = True,
) -> tuple[jnp.ndarray, dict]:
    """Deep-ensemble metrics (reference evaluate_de, evaluation.py:206-331)."""
    metrics_dict = dict(metrics_dict or {})
    rng_key = jax.random.PRNGKey(42) if rng_key is None else rng_key

    with jax.default_matmul_precision('float32'):
        preds = jax.vmap(lambda p: module.apply({'params': p}, x))(params)

    pw = M.pointwise_lppd(preds[:, None], y, task)  # members as chains
    metrics_dict['de_lppd'] = float(M.lppd(pw))
    if task == Task.REGRESSION:
        mean_pred = preds[..., 0].mean(axis=0)
        metrics_dict['de_rmse'] = float(jnp.sqrt(jnp.mean((y - mean_pred) ** 2)))
        if nominal_coverages and n_samples:
            keys = jax.random.split(rng_key, n_samples)
            point = jax.vmap(
                lambda k: sample_from_predictions(preds, task, k),
                out_axes=1)(keys)  # (members, n_samples, N)
            coverage = calculate_coverage(nominal_coverages, y, point)
            metrics_dict['de_cal_error'] = float(
                calibration_error(jnp.array(nominal_coverages), coverage))
            for c, v in zip(nominal_coverages, coverage):
                metrics_dict[f'de_coverage_{c}'] = float(v)
    else:
        vote = _majority_vote(np.asarray(preds.argmax(axis=-1)), axis=(0,))
        metrics_dict['de_acc'] = float(np.mean(np.asarray(y) == vote))

    if verbose:
        key = 'de_rmse' if task == Task.REGRESSION else 'de_acc'
        logger.info('DE | LPPD: %.3f, %s: %.4f',
                    metrics_dict['de_lppd'], key.upper(), metrics_dict[key])
    return preds, metrics_dict
