#!/usr/bin/env python
"""Headline benchmark: MCLMC posterior sampling throughput on the airfoil BNN.

The reference's headline workload (README.md:9-14 +
experiments/illustrative_example_readme/mclmc.yaml): UCI airfoil, FCN
[16,16,16,2], 12 chains. We measure steady-state sampler throughput —
total MCLMC kernel steps per second across all chains (each step = one
full-batch posterior fwd+bwd + isokinetic update + momentum refresh).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against the reference-equivalent CPU throughput
measured on this container's 2-vCPU host (the reference is CPU-only —
SURVEY §6; 12 chains via fake devices). See CPU_BASELINE_SAMPLES_PER_SEC.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# persistent compilation cache: repeat bench runs skip the (large) tuner
# compile entirely
os.makedirs('/tmp/mile_tpu_jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/mile_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

# Reference-style throughput on this container's CPU host, measured with
# `bench.py --reference-style-baseline`: the REFERENCE'S execution
# structure (pmap over 12 faked CPU devices + per-draw host egress via
# io_callback, mirroring /root/reference/train.py:16 and
# src/training/sampling.py:200-216) driving an algorithmically identical
# MCLMC step (isokinetic McLachlan, 2 grads/step — the reference's
# BlackJAX stack is not installable in this image, so its runtime shape
# is reproduced with this repo's kernels). The plain `--cpu-baseline`
# (this framework's own vmap path on CPU) measures 2446 s/s — the
# reference-style number below is the fairer "vs reference" denominator.
# Measured 2026-08-19: 634.0 samples/s (24,000/24,000 per-draw callbacks
# received). This framework's own CPU path on the same host: 2,446 s/s.
# Both denominators are emitted in the headline JSON (vs_reference_style /
# vs_own_cpu) so the ratio is self-describing (VERDICT r2 weak 7).
REFERENCE_STYLE_BASELINE_SAMPLES_PER_SEC = 634.0
OWN_CPU_BASELINE_SAMPLES_PER_SEC = 2446.0
CPU_BASELINE_SAMPLES_PER_SEC = REFERENCE_STYLE_BASELINE_SAMPLES_PER_SEC

# TPU v5e peak dense throughput: 394 TFLOP/s int8 / 197 TFLOP/s bf16.
# MFU numbers are only meaningful against this chip; on other backends
# the benches report it as None.
PEAK_BF16_V5E = 394e12 / 2


def _peak_bf16() -> float | None:
    return (PEAK_BF16_V5E
            if jax.devices()[0].platform == 'tpu' else None)


def _mfu(achieved: float) -> float | None:
    peak = _peak_bf16()
    return round(achieved / peak, 4) if peak else None


N_CHAINS = 12
HIDDEN = [16, 16, 16, 2]
WARMUP_STEPS = 2000
TIMED_STEPS = 3000


def build_workload():
    from mile_tpu.bayes import BayesianModel, Prior
    from mile_tpu.config import DataConfig, FCNConfig, PriorDist, Task
    from mile_tpu.data import TabularLoader
    from mile_tpu.models import build_model

    data_cfg = DataConfig(path='data/airfoil.data', task=Task.REGRESSION,
                          train_split=0.7, valid_split=0.1, test_split=0.2)
    # host-side int seed: data loading performs zero device dispatches, so
    # a sick chip cannot kill the bench before the workload even starts
    # (VERDICT r4 weak 1 — BENCH_r04 died exactly here)
    loader = TabularLoader(data_cfg, 0)
    module = build_model(FCNConfig(hidden_structure=HIDDEN))
    x, y = loader.arrays('train')
    template = module.init(jax.random.PRNGKey(1), x[:1])['params']
    bayes = BayesianModel(module, template,
                          Prior.from_name(PriorDist.STANDARD_NORMAL),
                          Task.REGRESSION)
    return bayes, bayes.logdensity_fn(x, y)


N_REPEATS = 7  # headline = median of N timed blocks (VERDICT r3 weak 1)
BEST_PER_CHIP_CHAINS = 48  # measured per-chip throughput knee (RESULTS.md)


def _measure_throughput(n_chains: int, n_repeats: int = N_REPEATS):
    """Median/IQR steady-state MCLMC samples/s at ``n_chains`` after a
    real tuner warmup. Repeats re-run the same compiled block with fresh
    fold_in keys, so spread reflects chip/tunnel noise, not compilation."""
    import statistics

    from mile_tpu.config import SamplerConfig
    from mile_tpu.mcmc import mclmc
    from mile_tpu.train.sampling import warmup_mclmc

    bayes, logdensity = build_workload()
    cfg = SamplerConfig(warmup_steps=WARMUP_STEPS, n_chains=n_chains,
                        n_samples=TIMED_STEPS, step_size_init=0.01,
                        desired_energy_var_start=0.5,
                        desired_energy_var_end=0.1)

    keys = jax.random.split(jax.random.PRNGKey(2), n_chains)
    positions = jax.vmap(
        lambda k: 0.1 * jax.random.normal(k, (bayes.dim,)))(keys)

    states, params, _ = warmup_mclmc(logdensity, cfg, jax.random.PRNGKey(3),
                                     positions)

    kernel = mclmc.build_kernel(logdensity)

    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def run_block(keys, states, n):
        def chain(key, state, L, eps, sdc):
            def step(state, k):
                state, info = kernel(k, state, L, eps, sdc)
                return state, info.energy_change

            # unroll amortizes per-iteration loop overhead on this
            # latency-bound tiny-model step (+9% measured on v5e)
            state, de = jax.lax.scan(step, state, jax.random.split(key, n),
                                     unroll=4)
            return state, de[-1]

        return jax.vmap(chain, in_axes=(0, 0, 0, 0, 0))(
            keys, states, params.L, params.step_size, params.sqrt_diag_cov)

    # compile + warm the pipeline
    states, _ = jax.block_until_ready(run_block(keys, states, TIMED_STEPS))

    rates = []
    for rep in range(n_repeats):
        keys = jax.vmap(jax.random.fold_in)(
            keys, jnp.full(n_chains, rep + 1, dtype=jnp.uint32))
        t0 = time.perf_counter()
        states, _ = jax.block_until_ready(
            run_block(keys, states, TIMED_STEPS))
        elapsed = time.perf_counter() - t0
        rates.append(n_chains * TIMED_STEPS / elapsed)
    rates.sort()
    q = statistics.quantiles(rates, n=4)
    return {'median': statistics.median(rates), 'iqr': q[2] - q[0],
            'min': rates[0], 'max': rates[-1], 'n_repeats': n_repeats}


# ---------------------------------------------------------------- resilience
# Round 4's driver bench crashed (rc=1, no JSON) on a chip left wedged by
# earlier kernel faults. The bench now (a) preflights device health,
# (b) retries the workload on device-fault-shaped errors with a cool-off
# (the tunnel recovers on its own in minutes), and (c) on final failure
# still emits ONE parseable JSON line with an `error` field. Mirrors the
# hardening experiments/run_catalog.py got in round 4 (VERDICT r4 next 1).
FAULT_MARKERS = ('UNAVAILABLE', 'FAILED_PRECONDITION', 'DEADLINE_EXCEEDED',
                 'kernel fault', 'device error', 'INTERNAL')
BENCH_ATTEMPTS = int(os.environ.get('MILE_BENCH_ATTEMPTS', '3'))
BENCH_COOLOFF_S = float(os.environ.get('MILE_BENCH_COOLOFF_S', '120'))


def _is_device_fault(exc: BaseException) -> bool:
    text = repr(exc)
    return any(m in text for m in FAULT_MARKERS)


def _preflight() -> None:
    """Cheap device-health probe: one tiny dispatch, fail fast if the
    backend is wedged (so the retry/cool-off loop starts immediately
    instead of dying mid-warmup with partial state)."""
    x = jnp.ones((8, 8))
    jax.block_until_ready(x @ x)


def _with_retries(fn, label: str):
    """Run ``fn`` with device-fault retries + cool-off; re-raise others."""
    last = None
    for attempt in range(BENCH_ATTEMPTS):
        try:
            _preflight()
            return fn()
        except Exception as exc:  # noqa: BLE001 — classified below
            if not _is_device_fault(exc):
                raise
            last = exc
            print(f'bench: {label} attempt {attempt + 1}/{BENCH_ATTEMPTS} '
                  f'hit a device fault ({repr(exc)[:200]}); cooling off '
                  f'{BENCH_COOLOFF_S:.0f}s', file=sys.stderr)
            if attempt + 1 < BENCH_ATTEMPTS:
                time.sleep(BENCH_COOLOFF_S)
    raise last


def _measure_warmstart(n_members: int):
    """Ensemble-SGD (warmstart) throughput: member-steps/s on the airfoil
    workload (VERDICT r4 next 6 — BASELINE.md tracks warmstart wall time;
    ref trainer.py:329). One full `train_ensemble` program (scanned
    epochs, minibatch AdamW, validation eval per epoch) is compiled, then
    timed on its second invocation so the number is steady-state."""
    from mile_tpu.config import DataConfig, FCNConfig, Task
    from mile_tpu.config.training import OptimizerConfig, WarmstartConfig
    from mile_tpu.data import TabularLoader
    from mile_tpu.models import build_model
    from mile_tpu.train.warmstart import train_ensemble

    data_cfg = DataConfig(path='data/airfoil.data', task=Task.REGRESSION,
                          train_split=0.7, valid_split=0.1, test_split=0.2)
    loader = TabularLoader(data_cfg, 0)
    module = build_model(FCNConfig(hidden_structure=HIDDEN))
    n_epochs = 200
    cfg = WarmstartConfig(
        include=True, max_epochs=n_epochs, batch_size=32, patience=None,
        optimizer_config=OptimizerConfig())  # adamw, lr=1e-3 (defaults)
    n_batches = max(1, loader.arrays('train')[0].shape[0] // 32)

    def run(key):
        params, _ = train_ensemble(module, loader, cfg, Task.REGRESSION,
                                   n_members, key)
        return jax.block_until_ready(params)

    run(jax.random.PRNGKey(0))  # compile + warm
    t0 = time.perf_counter()
    run(jax.random.PRNGKey(1))
    elapsed = time.perf_counter() - t0
    return {'member_steps_per_sec':
                round(n_members * n_epochs * n_batches / elapsed, 1),
            'epochs_per_sec': round(n_epochs / elapsed, 2),
            'wall_s': round(elapsed, 2)}


def main() -> None:
    try:
        head = _with_retries(lambda: _measure_throughput(N_CHAINS),
                             'headline-12')
        best = _with_retries(
            lambda: _measure_throughput(BEST_PER_CHIP_CHAINS), 'knee-48')
        ws12 = _with_retries(lambda: _measure_warmstart(N_CHAINS),
                             'warmstart-12')
        ws48 = _with_retries(
            lambda: _measure_warmstart(BEST_PER_CHIP_CHAINS),
            'warmstart-48')
    except Exception as exc:  # noqa: BLE001 — final failure: parseable line
        import traceback

        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            'metric': 'mclmc_airfoil_samples_per_sec', 'value': None,
            'unit': 'posterior samples/s (12 chains, full-batch airfoil '
                    'FCN)',
            'vs_baseline': None,
            'error': repr(exc)[:500],
            'attempts': BENCH_ATTEMPTS,
        }))
        sys.exit(1)
    samples_per_sec = head['median']
    print(json.dumps({
        'metric': 'mclmc_airfoil_samples_per_sec',
        'value': round(samples_per_sec, 1),
        'unit': 'posterior samples/s (12 chains, full-batch airfoil FCN)',
        # spread across N_REPEATS identical compiled blocks — separates
        # chip/tunnel noise from real regressions (VERDICT r3 weak 1)
        'iqr': round(head['iqr'], 1),
        'min': round(head['min'], 1),
        'max': round(head['max'], 1),
        'n_repeats': head['n_repeats'],
        # the same sampler at the measured per-chip throughput knee
        # (48 chains; the 12-chain headline keeps reference parity —
        # VERDICT r3 weak 2)
        'best_per_chip_samples_per_sec': round(best['median'], 1),
        'best_per_chip_n_chains': BEST_PER_CHIP_CHAINS,
        'best_per_chip_iqr': round(best['iqr'], 1),
        # headline ratio = vs the measured reference-style CPU baseline;
        # both denominators spelled out so the number is self-describing
        'vs_baseline': round(
            samples_per_sec / REFERENCE_STYLE_BASELINE_SAMPLES_PER_SEC, 2),
        'vs_reference_style': round(
            samples_per_sec / REFERENCE_STYLE_BASELINE_SAMPLES_PER_SEC, 2),
        'vs_own_cpu': round(
            samples_per_sec / OWN_CPU_BASELINE_SAMPLES_PER_SEC, 2),
        # warmstart (ensemble SGD) phase perf — BASELINE.md tracks the
        # reference's warmstart wall time (ref trainer.py:329);
        # member-steps/s = members x epochs x minibatches / wall
        'warmstart_12_member_steps_per_sec': ws12['member_steps_per_sec'],
        'warmstart_48_member_steps_per_sec': ws48['member_steps_per_sec'],
        'warmstart_12_wall_s': ws12['wall_s'],
        'warmstart_48_wall_s': ws48['wall_s'],
    }))


def reference_style_baseline() -> None:
    """Measure the reference's execution structure on this host's CPU.

    Reference runtime shape (SURVEY §2.3/§3.4): 12 chains pmapped over
    faked CPU devices (/root/reference/train.py:16, trainer.py:75-82),
    draws streamed to the host EVERY step via io_callback
    (src/training/sampling.py:200-216). The MCLMC step is algorithmically
    identical to the reference's BlackJAX kernel (isokinetic McLachlan,
    2 gradient evaluations per step); BlackJAX itself is not installable
    in this image. Prints a JSON line with the measured samples/s — paste
    into CPU_BASELINE_SAMPLES_PER_SEC.
    """
    import jax.experimental

    n = 1000
    bayes, logdensity = build_workload()
    from mile_tpu.mcmc import mclmc

    import numpy as np

    kernel = mclmc.build_kernel(logdensity)
    keys = jax.random.split(jax.random.PRNGKey(2), N_CHAINS)

    received = []

    def egress(position, chain_id):
        received.append(int(chain_id[0]))
        return np.zeros((), np.int32)

    def chain(key, chain_id):
        state = mclmc.init(0.1 * jax.random.normal(key, (bayes.dim,)),
                           logdensity, key)

        def step(state, k):
            state, info = kernel(k, state, jnp.asarray(1.5),
                                 jnp.asarray(0.01), jnp.ones(bayes.dim))
            # reference parity: per-draw host stream
            jax.experimental.io_callback(
                egress, jax.ShapeDtypeStruct((), np.int32),
                state.position, chain_id, ordered=False)
            return state, None

        state, _ = jax.lax.scan(step, state, jax.random.split(key, n))
        return state.position

    run = jax.pmap(chain)
    ids = jnp.arange(N_CHAINS)[:, None]
    jax.block_until_ready(run(keys, ids))  # compile
    keys2 = jax.vmap(jax.random.fold_in)(
        keys, jnp.ones(N_CHAINS, dtype=jnp.uint32))
    t0 = time.perf_counter()
    jax.block_until_ready(run(keys2, ids))
    elapsed = time.perf_counter() - t0
    print(json.dumps({
        'metric': 'reference_style_cpu_samples_per_sec',
        'value': round(N_CHAINS * n / elapsed, 1),
        'unit': 'samples/s (pmap + per-draw io_callback, 2-vCPU host)',
        'callbacks_received': len(received),
    }))


def lenet_mfu(compute_dtype='bfloat16', chunk=None) -> None:
    """Big-model device-perf point (VERDICT r1 item 4): MCLMC on a
    LeNet/FashionMNIST-scale posterior (61,706 params x 60,000 synthetic
    28x28 images, 12 chains), bf16 forward + fp32 energy accounting.

    Reports steps/s, achieved model FLOP/s (from XLA's cost analysis of
    the compiled sampling block), and MFU vs the chip's bf16 peak.
    """
    import numpy as np

    from mile_tpu.bayes import BayesianModel, Prior
    from mile_tpu.config import LeNetConfig, PriorDist, Task
    from mile_tpu.mcmc import mclmc
    from mile_tpu.models import build_model

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(60_000, 1, 28, 28).astype(np.float32))
    y = jnp.asarray(rs.randint(0, 10, size=(60_000,)).astype(np.int32))

    module = build_model(LeNetConfig(out_dim=10))
    template = module.init(jax.random.PRNGKey(1), x[:1])['params']
    bayes = BayesianModel(module, template,
                          Prior.from_name(PriorDist.STANDARD_NORMAL),
                          Task.CLASSIFICATION,
                          likelihood_chunk_size=chunk,
                          compute_dtype=compute_dtype)
    logdensity = bayes.logdensity_fn(x, y)
    kernel = mclmc.build_kernel(logdensity)

    keys = jax.random.split(jax.random.PRNGKey(2), N_CHAINS)
    positions = jax.vmap(
        lambda k: 0.05 * jax.random.normal(k, (bayes.dim,)))(keys)
    states = jax.jit(jax.vmap(
        lambda p, k: mclmc.init(p, logdensity, k)))(positions, keys)

    n_steps = 30

    def block(keys, states):
        def chain(key, state):
            def step(state, k):
                state, info = kernel(k, state, jnp.asarray(1.0),
                                     jnp.asarray(1e-4), 1.0)
                return state, info.energy_change

            state, de = jax.lax.scan(step, state,
                                     jax.random.split(key, n_steps))
            return state, de[-1]

        return jax.vmap(chain)(keys, states)

    run = jax.jit(block)
    # Model-FLOPs accounting (MFU convention: required FLOPs only, remat
    # recompute excluded). LeNet forward per image: conv1 28x28x6x25x2 +
    # conv2 10x10x16x150x2 + fc 400->120->84->10 = 833,040 FLOP; one
    # gradient = 3x forward; one MCLMC step = 2 gradients over the full
    # 60k batch. XLA's client-side cost_analysis is used when available.
    fwd_flops_per_img = 833_040
    flops_per_step_chain = 2 * 3 * fwd_flops_per_img * x.shape[0]
    flops_per_block = float(flops_per_step_chain) * N_CHAINS * n_steps
    try:
        cost = run.lower(keys, states).cost_analysis() or {}
        if cost.get('flops'):
            flops_per_block = float(cost['flops'])
    except Exception:
        pass

    states, _ = jax.block_until_ready(run(keys, states))  # warm
    keys2 = jax.vmap(jax.random.fold_in)(
        keys, jnp.ones(N_CHAINS, dtype=jnp.uint32))
    t0 = time.perf_counter()
    states, _ = jax.block_until_ready(run(keys2, states))
    elapsed = time.perf_counter() - t0

    steps_per_sec = N_CHAINS * n_steps / elapsed
    achieved = flops_per_block / elapsed
    print(json.dumps({
        'metric': 'mclmc_lenet_fmnist_steps_per_sec',
        'value': round(steps_per_sec, 2),
        'unit': ('MCLMC steps/s (12 chains, 61.7k-param LeNet, 60k-image '
                 'full-batch posterior, bf16 fwd + fp32 energy)'),
        'model_tflops_per_sec': round(achieved / 1e12, 2),
        'mfu_vs_bf16_peak': _mfu(achieved),
        'dtype': str(compute_dtype),
        'likelihood_chunk_size': chunk,
        'flops_per_step_per_chain': round(
            flops_per_block / (N_CHAINS * n_steps) / 1e9, 3),
    }))


def fcn_mfu(compute_dtype='bfloat16', chunk=8192, width=512,
            integrator='mclachlan', donate=False) -> None:
    """Matmul-dominated device-perf point: MCLMC on a wide-FCN posterior.

    LeNet's MFU ceiling is architectural (6/16-channel convs fill <13% of
    the 128-wide MXU lanes). This workload removes that bound: FCN
    [width, width, width, 2] over 65,536 synthetic rows x 128 features —
    every hot op is a (batch x 512)-class matmul that tiles the MXU
    fully, so the number here is the framework's *realizable* sampling
    MFU when the model supplies the FLOPs (reference has no analogous
    measurement; SURVEY §6 notes it publishes no perf numbers at all).
    """
    import numpy as np

    from mile_tpu.bayes import BayesianModel, Prior
    from mile_tpu.config import FCNConfig, PriorDist, Task
    from mile_tpu.mcmc import mclmc
    from mile_tpu.models import build_model

    n_rows, n_feat = 65_536, 128
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(n_rows, n_feat).astype(np.float32))
    y = jnp.asarray(rs.rand(n_rows).astype(np.float32))

    module = build_model(FCNConfig(hidden_structure=[width, width, width, 2]))
    template = module.init(jax.random.PRNGKey(1), x[:1])['params']
    bayes = BayesianModel(module, template,
                          Prior.from_name(PriorDist.STANDARD_NORMAL),
                          Task.REGRESSION,
                          likelihood_chunk_size=chunk,
                          compute_dtype=compute_dtype)
    logdensity = bayes.logdensity_fn(x, y)
    kernel = mclmc.build_kernel(logdensity, integrator=integrator)

    keys = jax.random.split(jax.random.PRNGKey(2), N_CHAINS)
    positions = jax.vmap(
        lambda k: 0.02 * jax.random.normal(k, (bayes.dim,)))(keys)
    states = jax.jit(jax.vmap(
        lambda p, k: mclmc.init(p, logdensity, k)))(positions, keys)

    n_steps = 10

    def block(keys, states):
        def chain(key, state):
            def step(state, k):
                state, info = kernel(k, state, jnp.asarray(1.0),
                                     jnp.asarray(1e-5), 1.0)
                return state, info.energy_change

            state, de = jax.lax.scan(step, state,
                                     jax.random.split(key, n_steps))
            return state, de[-1]

        return jax.vmap(chain)(keys, states)

    # donating the chain states lets XLA alias the scan carry in place of
    # a fresh HBM allocation per block (VERDICT r2 next 5 probe)
    run = jax.jit(block, donate_argnums=(1,) if donate else ())
    # model FLOPs (MFU convention, remat recompute excluded): fwd =
    # 2 * rows * (feat*w + w*w + w*w + w*2); grad = 3x fwd; step = 2 grads
    fwd = 2 * n_rows * (n_feat * width + 2 * width * width + width * 2)
    flops_per_block = float(2 * 3 * fwd) * N_CHAINS * n_steps
    xla_flops_per_block = None
    try:
        # XLA cross-check (ADVICE r2: a future FCNConfig change must not
        # silently skew the published MFU). Under remat
        # (likelihood_chunk_size) cost_analysis counts RECOMPUTED flops
        # too, so the hand count stays the MFU numerator (model FLOPs)
        # and the XLA figure is reported alongside as hardware FLOPs.
        cost = run.lower(keys, states).cost_analysis() or {}
        if cost.get('flops'):
            xla_flops_per_block = float(cost['flops'])
    except Exception:
        pass

    states, _ = jax.block_until_ready(run(keys, states))  # warm
    keys2 = jax.vmap(jax.random.fold_in)(
        keys, jnp.ones(N_CHAINS, dtype=jnp.uint32))
    t0 = time.perf_counter()
    states, _ = jax.block_until_ready(run(keys2, states))
    elapsed = time.perf_counter() - t0

    steps_per_sec = N_CHAINS * n_steps / elapsed
    achieved = flops_per_block / elapsed
    print(json.dumps({
        'metric': 'mclmc_wide_fcn_steps_per_sec',
        'value': round(steps_per_sec, 2),
        'unit': (f'MCLMC steps/s (12 chains, {bayes.dim}-param FCN '
                 f'[{width}x3], 65k-row full-batch posterior, '
                 f'{compute_dtype} fwd + fp32 energy)'),
        'model_tflops_per_sec': round(achieved / 1e12, 2),
        'mfu_vs_bf16_peak': _mfu(achieved),
        'hw_tflops_per_sec': (round(xla_flops_per_block / elapsed / 1e12, 2)
                              if xla_flops_per_block else None),
        'dtype': str(compute_dtype),
        'likelihood_chunk_size': chunk,
        'integrator': integrator,
        'donate': donate,
    }))


def chain_scaling(workload: str = 'airfoil', chain_counts=None,
                  n_steps: int | None = None) -> None:
    """Throughput vs ensemble size on one chip (BASELINE.json configs[4]
    "1024+ particles" axis, single-chip edition; VERDICT r2 next 3).

    Measures MCLMC samples/s at n_chains ∈ {12..1536} on (a) the headline
    airfoil posterior (~1k params — latency/occupancy-bound at small
    ensembles, FLOP-bound once the chain batch fills the MXU) and (b) the
    wide-FCN posterior (590k params — FLOP-bound from the start; chain
    counts capped by HBM: state+grads ~ 3 * n_chains * dim * 4B).
    Prints one JSON line per point plus a summary line.
    """
    from mile_tpu.bayes import BayesianModel, Prior
    from mile_tpu.config import FCNConfig, PriorDist, Task
    from mile_tpu.mcmc import mclmc
    from mile_tpu.models import build_model

    import numpy as np

    if workload == 'airfoil':
        bayes, logdensity = build_workload()
        chain_counts = chain_counts or [12, 48, 192, 768, 1536]
        n_steps = n_steps or 1000
        eps, L = 0.01, 1.5
    elif workload == 'fcn':
        n_rows, n_feat, width = 65_536, 128, 512
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.rand(n_rows, n_feat).astype(np.float32))
        y = jnp.asarray(rs.rand(n_rows).astype(np.float32))
        module = build_model(
            FCNConfig(hidden_structure=[width, width, width, 2]))
        template = module.init(jax.random.PRNGKey(1), x[:1])['params']
        bayes = BayesianModel(module, template,
                              Prior.from_name(PriorDist.STANDARD_NORMAL),
                              Task.REGRESSION, likelihood_chunk_size=8192,
                              compute_dtype='bfloat16')
        logdensity = bayes.logdensity_fn(x, y)
        chain_counts = chain_counts or [4, 12, 48]
        n_steps = n_steps or 10
        eps, L = 1e-5, 1.0
    else:
        raise SystemExit(f'unknown --chain-scaling workload {workload!r}')

    kernel = mclmc.build_kernel(logdensity)
    points = []
    for n_chains in chain_counts:
        keys = jax.random.split(jax.random.PRNGKey(2), n_chains)
        positions = jax.vmap(
            lambda k: 0.05 * jax.random.normal(k, (bayes.dim,)))(keys)
        states = jax.jit(jax.vmap(
            lambda p, k: mclmc.init(p, logdensity, k)))(positions, keys)

        def block(keys, states):
            def chain(key, state):
                def step(state, k):
                    state, info = kernel(k, state, jnp.asarray(L),
                                         jnp.asarray(eps), 1.0)
                    return state, info.energy_change

                state, de = jax.lax.scan(
                    step, state, jax.random.split(key, n_steps),
                    unroll=4 if workload == 'airfoil' else 1)
                return state, de[-1]

            return jax.vmap(chain)(keys, states)

        run = jax.jit(block)
        states, _ = jax.block_until_ready(run(keys, states))  # compile+warm
        keys2 = jax.vmap(jax.random.fold_in)(
            keys, jnp.ones(n_chains, dtype=jnp.uint32))
        t0 = time.perf_counter()
        states, _ = jax.block_until_ready(run(keys2, states))
        elapsed = time.perf_counter() - t0
        sps = n_chains * n_steps / elapsed
        points.append((n_chains, round(sps, 1)))
        print(json.dumps({
            'metric': f'mclmc_{workload}_chain_scaling',
            'n_chains': n_chains, 'value': round(sps, 1),
            'unit': 'samples/s', 'per_chain': round(sps / n_chains, 2),
            'elapsed_s': round(elapsed, 3),
        }))
    print(json.dumps({
        'metric': f'mclmc_{workload}_chain_scaling_summary',
        'value': points[-1][1], 'unit': 'samples/s at max ensemble',
        'points': points, 'dim': bayes.dim,
    }))


def _chunk_flag(argv, default):
    """--chunk N (0 or 'none' => unchunked). Shared by both MFU modes
    (ADVICE r2: the two branches used to disagree on what 0 meant)."""
    if '--chunk' not in argv:
        return default
    raw = argv[argv.index('--chunk') + 1]
    if raw.lower() in ('none', '0'):
        return None
    return int(raw)


if __name__ == '__main__':
    import sys

    if '--help' in sys.argv or '-h' in sys.argv:
        print(__doc__)
        print('modes: (default headline) | --fcn-mfu [--width W --chunk C --donate '
              '--f32 --integrator pallas] | --lenet-mfu [--chunk C --f32] | '
              '--chain-scaling [airfoil|fcn] [--chains a,b,c] | '
              '--reference-style-baseline | --cpu-baseline | --cpu')
        sys.exit(0)
    if '--fcn-mfu' in sys.argv:
        chunk = _chunk_flag(sys.argv, 8192)
        width = 512
        if '--width' in sys.argv:
            width = int(sys.argv[sys.argv.index('--width') + 1])
        dtype = ('float32' if '--f32' in sys.argv else 'bfloat16')
        integ = 'mclachlan'
        if '--integrator' in sys.argv:
            integ = sys.argv[sys.argv.index('--integrator') + 1]
            if integ == 'pallas':
                integ = 'mclachlan_pallas'
        if '--cpu' in sys.argv:
            jax.config.update('jax_platforms', 'cpu')
        fcn_mfu(compute_dtype=dtype, chunk=chunk, width=width,
                integrator=integ, donate='--donate' in sys.argv)
        sys.exit(0)
    if '--lenet-mfu' in sys.argv:
        chunk = _chunk_flag(sys.argv, None)
        dtype = ('float32' if '--f32' in sys.argv else 'bfloat16')
        if '--cpu' in sys.argv:
            jax.config.update('jax_platforms', 'cpu')
        lenet_mfu(compute_dtype=dtype, chunk=chunk)
        sys.exit(0)
    if '--chain-scaling' in sys.argv:
        idx = sys.argv.index('--chain-scaling')
        workload = (sys.argv[idx + 1]
                    if len(sys.argv) > idx + 1
                    and not sys.argv[idx + 1].startswith('-') else 'airfoil')
        counts = None
        if '--chains' in sys.argv:
            counts = [int(c) for c in
                      sys.argv[sys.argv.index('--chains') + 1].split(',')]
        if '--cpu' in sys.argv:
            jax.config.update('jax_platforms', 'cpu')
        chain_scaling(workload, counts)
        sys.exit(0)
    if '--reference-style-baseline' in sys.argv:
        os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                                   f' --xla_force_host_platform_device_count='
                                   f'{N_CHAINS}').strip()
        jax.config.update('jax_platforms', 'cpu')
        reference_style_baseline()
        sys.exit(0)
    if '--cpu-baseline' in sys.argv:
        jax.config.update('jax_platforms', 'cpu')
    main()
