"""MCLMC hyperparameter adaptation (step size ε and decoherence length L).

Native reimplementation of the reference's BNN-adapted BlackJAX fork
(/root/reference/src/training/warmup.py:155-568). The algorithm, per chain:

Phase 1+2 (ratio 0.8/0.1 of the budget): one kernel step per iteration.
  - ε from energy-variance control: target ``Var[ΔE]/dim = v(t)`` where the
    desired energy variance v(t) decays linearly (or exponentially when the
    start value > 2) from ``desired_energy_var_start`` to ``_end``.
    Using the Var[ΔE] = O(ε^6) relation, keep an exponentially-decayed,
    trust-weighted average of ``ΔE²/(dim·v)·ε⁻⁶`` and set
    ``ε = (avg)^{-1/6}``, capped at the largest ε seen before a divergence.
  - During phase 2 only, stream ε-weighted E[x], E[x²] to estimate
    coordinate variances → ``L = sqrt(Σ var)``; with diagonal
    preconditioning instead ``sqrt_diag_cov = sqrt(var)``, ``L = sqrt(dim)``
    and a short ε re-adjustment run follows.
  - Non-finite proposals are rejected: state reverted, ε cap shrunk by 0.8,
    the sample excluded from the streams.

Phase 3 (ratio 0.1): run the tuned kernel, estimate ESS over the trace via
FFT autocorrelation, refine ``L = 0.4 · ε · n_steps / ESS``.

Everything is single-chain and functional; ``run`` vmaps over chains at the
call site, so all chains tune simultaneously in one compiled program.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from mile_tpu.mcmc import mclmc
from mile_tpu.mcmc.diagnostics import effective_sample_size


class MCLMCTuningParams(NamedTuple):
    L: jnp.ndarray
    step_size: jnp.ndarray
    sqrt_diag_cov: jnp.ndarray


class TuningConfig(NamedTuple):
    """Static knobs (mirror SamplerConfig fields).

    The numeric fields (step_size_init, desired_energy_var_*,
    trust_in_estimate, num_effective_samples) are DEFAULTS: at run time
    they travel as a :class:`TuningRuntime` of traced scalars, so a
    hyper-parameter sweep over them reuses ONE compiled tuner program
    (baking them as trace constants forced a fresh 4-15 min remote
    compile per grid value). Only genuinely structural knobs
    (warmup_steps = scan lengths, phase_ratio, diagonal_preconditioning,
    integrator, the FFT caps, trace_every) stay compile-time.
    """

    warmup_steps: int = 1000
    phase_ratio: tuple = (0.8, 0.1, 0.1)
    step_size_init: float = 0.005
    desired_energy_var_start: float = 5e-4
    desired_energy_var_end: float = 5e-4
    trust_in_estimate: float = 1.5
    num_effective_samples: int = 100
    diagonal_preconditioning: bool = False
    integrator: str = 'mclachlan'
    ess_params_limit: int = 2000   # coordinate subsample cap for phase-3 FFT
    ess_samples_limit: int = 10000  # trace-length cap for phase-3 FFT
    trace_every: int = 0  # keep every Nth phase-1/2 position (0 = none)

    def runtime(self) -> 'TuningRuntime':
        return TuningRuntime(
            step_size_init=jnp.asarray(self.step_size_init, jnp.float32),
            desired_energy_var_start=jnp.asarray(
                self.desired_energy_var_start, jnp.float32),
            desired_energy_var_end=jnp.asarray(
                self.desired_energy_var_end, jnp.float32),
            trust_in_estimate=jnp.asarray(
                self.trust_in_estimate, jnp.float32),
            num_effective_samples=jnp.asarray(
                self.num_effective_samples, jnp.float32),
        )


class TuningRuntime(NamedTuple):
    """Numeric tuning knobs as traced scalars (one compile per SHAPE of
    sweep, not per value)."""

    step_size_init: jnp.ndarray
    desired_energy_var_start: jnp.ndarray
    desired_energy_var_end: jnp.ndarray
    trust_in_estimate: jnp.ndarray
    num_effective_samples: jnp.ndarray


def _energy_var_schedule(rt: TuningRuntime, total_steps: int):
    """Reference decay schedules (warmup.py:249-269): exponential when the
    start target is large (>2), else linear. The branch condition is a
    traced value now, so both arms are computed and selected."""
    start, end = rt.desired_energy_var_start, rt.desired_energy_var_end
    tau = total_steps / 4.0

    def sched(step):
        decay = jnp.exp(-step / tau)
        exp_val = start * decay + end * (1.0 - decay)
        progress = jnp.minimum(step / total_steps, 1.0)
        lin_val = start - (start - end) * progress
        return jnp.where(start > 2.0, exp_val, lin_val)

    return sched


class _AdaptState(NamedTuple):
    state: mclmc.MCLMCState
    params: MCLMCTuningParams
    time: jnp.ndarray          # decayed weight sum for the ε estimator
    x_avg: jnp.ndarray         # decayed average of xi/ε⁶
    step_size_max: jnp.ndarray  # divergence cap
    stream_w: jnp.ndarray      # streamed weight for E[x], E[x²]
    stream_mean: jnp.ndarray   # (2, dim): E[x], E[x²]


def _reject_nonfinite(prev_state, new_state, step_size, step_size_max,
                      energy_change):
    """Reference handle_nans (warmup.py:468-483): revert on non-finite.

    Hardened beyond the reference: a non-finite ENERGY change (e.g. a -inf
    log-density plateau with finite positions) is also a rejection —
    otherwise ``0 * inf`` poisons the ε estimator stream.
    """
    ok = jnp.all(jnp.isfinite(new_state.position)) & jnp.isfinite(energy_change)
    state = jax.tree.map(
        lambda new, old: jax.lax.select(ok, jnp.nan_to_num(new), old),
        new_state, prev_state)
    step_size_max = jax.lax.select(ok, step_size_max, step_size * 0.8)
    energy_change = jax.lax.select(ok, jnp.nan_to_num(energy_change), 0.0)
    return ok, state, step_size_max, energy_change


def _make_phase12_step(kernel, dim, rt: TuningRuntime, total_steps: int):
    sched = _energy_var_schedule(rt, total_steps)
    decay = ((rt.num_effective_samples - 1.0)
             / (rt.num_effective_samples + 1.0))
    trust = rt.trust_in_estimate

    def one_step(carry: _AdaptState, xs):
        in_phase2, step_number, rng_key = xs
        new_state, info = kernel(
            rng_key, carry.state, carry.params.L, carry.params.step_size,
            carry.params.sqrt_diag_cov)
        ok, state, step_size_max, energy_change = _reject_nonfinite(
            carry.state, new_state, carry.params.step_size,
            carry.step_size_max, info.energy_change)

        # ε from the Var[ΔE] = O(ε^6) law, trust-weighted
        xi = jnp.square(energy_change) / (dim * sched(step_number)) + 1e-8
        weight = jnp.exp(-0.5 * jnp.square(jnp.log(xi) / (6.0 * trust)))
        x_avg = decay * carry.x_avg + weight * (
            xi / jnp.power(carry.params.step_size, 6.0))
        time = decay * carry.time + weight
        step_size = jnp.power(x_avg / time, -1.0 / 6.0)
        step_size = jnp.minimum(step_size, step_size_max)
        params = carry.params._replace(step_size=step_size)

        # ε-weighted streaming E[x], E[x²] over phase-2 steps only
        w = in_phase2 * ok.astype(jnp.float32) * step_size
        new_w = carry.stream_w + w
        vals = jnp.stack([state.position, jnp.square(state.position)])
        stream_mean = carry.stream_mean + (
            w / jnp.maximum(new_w, 1e-30)) * (vals - carry.stream_mean)

        return _AdaptState(state, params, time, x_avg, step_size_max,
                           new_w, stream_mean), None

    return one_step


def _phase3_refine_L(kernel, cfg: TuningConfig, state, params, num_steps,
                     rng_key):
    """ESS-based L refinement (reference make_adaptation_L, warmup.py:408-465)."""

    def step(state, key):
        new_state, _ = kernel(key, state, params.L, params.step_size,
                              params.sqrt_diag_cov)
        return new_state, new_state.position

    keys = jax.random.split(rng_key, num_steps)
    state, trace = jax.lax.scan(step, state, keys)  # (steps, dim)

    dim = trace.shape[1]
    if dim > cfg.ess_params_limit:
        coords = jax.random.permutation(rng_key, dim)[: cfg.ess_params_limit]
        trace = trace[:, coords]
    if num_steps > cfg.ess_samples_limit:
        idx = jnp.linspace(0, num_steps - 1, cfg.ess_samples_limit).astype(jnp.int32)
        trace = trace[idx]
    ess = effective_sample_size(trace[None, ...])
    L = 0.4 * params.step_size * jnp.mean(num_steps / ess)
    return state, params._replace(L=L)


def mclmc_tune(
    logdensity_fn: Callable,
    position: jnp.ndarray,
    rng_key: jax.Array,
    cfg: TuningConfig,
    rt: TuningRuntime | None = None,
) -> tuple[mclmc.MCLMCState, MCLMCTuningParams]:
    """Tune (ε, L, sqrt_diag_cov) for one chain starting at ``position``.

    vmap over (position, rng_key) for multi-chain tuning. Pass ``rt``
    explicitly (as a jit argument) so numeric-knob sweeps share one
    compiled program; when None it is built from ``cfg`` (the values
    become trace constants — fine outside sweeps).
    """
    if rt is None:
        rt = cfg.runtime()
    dim = position.shape[0]
    kernel = mclmc.build_kernel(logdensity_fn, integrator=cfg.integrator)

    t1 = int(cfg.warmup_steps * cfg.phase_ratio[0])
    t2 = int(cfg.warmup_steps * cfg.phase_ratio[1])
    t3 = int(cfg.warmup_steps * cfg.phase_ratio[2])

    init_key, run_key, adjust_key, phase3_key = jax.random.split(rng_key, 4)
    state = mclmc.init(position, logdensity_fn, init_key)
    params = MCLMCTuningParams(
        L=jnp.maximum(jnp.sqrt(1.0 * dim), 15.0),
        step_size=jnp.asarray(rt.step_size_init),
        sqrt_diag_cov=jnp.ones((dim,)),
    )

    one_step = _make_phase12_step(kernel, dim, rt, t1 + t2 + 1)

    def run_steps(state, params, in_phase2, keys, start_step):
        """One flat scan; optionally traced with a two-level scan that
        keeps every ``cfg.trace_every``-th position (keep_warmup)."""
        init = _AdaptState(
            state=state, params=params,
            time=jnp.asarray(0.0), x_avg=jnp.asarray(0.0),
            step_size_max=jnp.asarray(jnp.inf),
            stream_w=jnp.asarray(0.0),
            stream_mean=jnp.zeros((2, dim)),
        )
        steps = jnp.arange(len(keys)) + start_step
        if not cfg.trace_every:
            out, _ = jax.lax.scan(one_step, init, (in_phase2, steps, keys))
            return out, None
        thin = cfg.trace_every
        n = (len(keys) // thin) * thin
        blk = lambda a: a[:n].reshape(n // thin, thin, *a.shape[1:])

        def outer(carry, xs):
            carry, _ = jax.lax.scan(one_step, carry, xs)
            return carry, carry.state.position

        out, trace = jax.lax.scan(
            outer, init, (blk(in_phase2), blk(steps), blk(keys)))
        # tail steps that don't fill a block
        if n < len(keys):
            out, _ = jax.lax.scan(
                one_step, out, (in_phase2[n:], steps[n:], keys[n:]))
        return out, trace

    # ---- phases 1+2: joint ε adaptation + streaming variance for L
    keys12 = jax.random.split(run_key, t1 + t2)
    in_phase2 = jnp.concatenate([jnp.zeros(t1), jnp.ones(t2)])
    out, warmup_trace = run_steps(state, params, in_phase2, keys12, 0)
    state, params = out.state, out.params

    if t2 > 0:
        x_mean, x2_mean = out.stream_mean[0], out.stream_mean[1]
        variances = jnp.maximum(x2_mean - jnp.square(x_mean), 1e-30)
        if cfg.diagonal_preconditioning:
            params = params._replace(
                sqrt_diag_cov=jnp.sqrt(variances),
                L=jnp.sqrt(1.0 * dim),
            )
            # short ε re-adjustment with the new preconditioner
            # (streaming stays OFF, matching the reference's masked run,
            # warmup.py:397-401)
            readjust = t2 // 3
            if readjust > 0:
                keys_r = jax.random.split(adjust_key, readjust)
                out, _ = run_steps(state, params, jnp.zeros(readjust),
                                   keys_r, 0)
                state, params = out.state, out.params
        else:
            params = params._replace(L=jnp.sqrt(jnp.sum(variances)))

    # ---- phase 3: ESS-based L refinement
    if t3 > 0:
        state, params = _phase3_refine_L(
            kernel, cfg, state, params, t3, phase3_key)

    if cfg.trace_every:
        return state, params, warmup_trace
    return state, params
