#!/usr/bin/env python
"""MCLMC matmul-dtype A/B on the 2.2M-param wide FCN (VERDICT r4 next 4).

Companion to the `dtype_ab` study in run_catalog.py (which measures LPPD
drift on the real airfoil posterior): this script measures, on the
FLOP-bound synthetic wide-FCN workload (FCN [1024,1024,1024,2] over
65k x 128 rows — bench.py's --fcn-mfu shape at --width 1024), what each
dtype policy does to

  * the TUNED (eps, L) the MCLMC tuner lands on (same seed, same budget),
  * steady-state sampling steps/s and achieved model-FLOP MFU.

Arms:
  f32def    float32 params/activations, TPU-default bf16 matmul passes
            (the framework's current MCLMC default)
  f32strict float32 params/activations, strict 6-pass f32 matmuls
            (sampler.matmul_precision='float32' — the exactness preset)
  bf16fwd   bfloat16 forward activations, f32 likelihood/energy
            (sampler.compute_dtype='bfloat16')

Runs STRICTLY serially on the chip; appends one JSON line per arm to
aggr_results/dtype_ab_widefcn.jsonl. ~15 min total warm, longer on the
first compile.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs('/tmp/mile_tpu_jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/mile_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

OUT = ROOT / 'aggr_results' / 'dtype_ab_widefcn.jsonl'
N_CHAINS = 12
# Width 1024 (2.23M params) reproducibly KERNEL-FAULTS the remote TPU in
# the MCLMC tuner program itself (2 attempts, 2026-08-21 — a second
# fault family, MCLMC-tuner-shaped, recorded in the jsonl; the same
# width runs fine at fixed eps, bench.py --fcn-mfu --width 1024). The
# A/B runs at width 512 (590k params) — still matmul-dominated and
# MXU-filling, with a working tuner.
WIDTH = int(os.environ.get('MILE_AB_WIDTH', '512'))
N_ROWS, N_FEAT = 65_536, 128
WARMUP_STEPS = 500
TIMED_STEPS = 10
PEAK_BF16 = 197e12  # v5e


def build(compute_dtype):
    from mile_tpu.bayes import BayesianModel, Prior
    from mile_tpu.config import FCNConfig, PriorDist, Task
    from mile_tpu.models import build_model

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(N_ROWS, N_FEAT).astype(np.float32))
    y = jnp.asarray(rs.rand(N_ROWS).astype(np.float32))
    module = build_model(FCNConfig(hidden_structure=[WIDTH] * 3 + [2]))
    template = module.init(jax.random.PRNGKey(1), x[:1])['params']
    bayes = BayesianModel(module, template,
                          Prior.from_name(PriorDist.STANDARD_NORMAL),
                          Task.REGRESSION, likelihood_chunk_size=8192,
                          compute_dtype=compute_dtype)
    return bayes, bayes.logdensity_fn(x, y)


def run_arm(tag: str, compute_dtype, warm_prec, sample_prec) -> dict:
    from mile_tpu.config import SamplerConfig
    from mile_tpu.mcmc import mclmc
    from mile_tpu.train.sampling import _prec_ctx, warmup_mclmc

    bayes, logdensity = build(compute_dtype)
    # warmup precision rides the config knob (warmup_mclmc applies it
    # internally; the framework default is f32 since this very A/B)
    cfg = SamplerConfig(warmup_steps=WARMUP_STEPS, n_chains=N_CHAINS,
                        n_samples=TIMED_STEPS, step_size_init=1e-4,
                        desired_energy_var_start=0.5,
                        desired_energy_var_end=0.1,
                        compute_dtype=compute_dtype,
                        warmup_matmul_precision=warm_prec)
    keys = jax.random.split(jax.random.PRNGKey(2), N_CHAINS)
    positions = jax.vmap(
        lambda k: 0.02 * jax.random.normal(k, (bayes.dim,)))(keys)

    def tuned_and_timed():
        t0 = time.time()
        states, params, _ = warmup_mclmc(
            logdensity, cfg, jax.random.PRNGKey(3), positions)
        warmup_wall = time.time() - t0

        kernel = mclmc.build_kernel(logdensity)

        def block(keys, states):
            def chain(key, state, L, eps, sdc):
                def step(state, k):
                    state, info = kernel(k, state, L, eps, sdc)
                    return state, info.energy_change

                state, de = jax.lax.scan(
                    step, state, jax.random.split(key, TIMED_STEPS))
                return state, de[-1]

            return jax.vmap(chain)(keys, states, params.L,
                                   params.step_size, params.sqrt_diag_cov)

        run = jax.jit(block)
        with _prec_ctx(sample_prec):
            states2, _ = jax.block_until_ready(run(keys, states))  # warm
            keys2 = jax.vmap(jax.random.fold_in)(
                keys, jnp.ones(N_CHAINS, dtype=jnp.uint32))
            t0 = time.perf_counter()
            jax.block_until_ready(run(keys2, states2))
        elapsed = time.perf_counter() - t0
        return params, warmup_wall, elapsed

    params, warmup_wall, elapsed = tuned_and_timed()

    eps = np.asarray(params.step_size)
    L = np.asarray(params.L)
    # model FLOPs (MFU convention, remat recompute excluded)
    fwd = 2 * N_ROWS * (N_FEAT * WIDTH + 2 * WIDTH * WIDTH + WIDTH * 2)
    flops_per_block = float(2 * 3 * fwd) * N_CHAINS * TIMED_STEPS
    steps_per_sec = N_CHAINS * TIMED_STEPS / elapsed
    achieved = flops_per_block / elapsed
    return dict(
        arm=f'{tag}_w{WIDTH}', dim=bayes.dim, n_chains=N_CHAINS,
        warmup_steps=WARMUP_STEPS, warmup_wall_s=round(warmup_wall, 1),
        eps_mean=float(eps.mean()), eps_std=float(eps.std()),
        L_mean=float(L.mean()), L_std=float(L.std()),
        steps_per_sec=round(steps_per_sec, 2),
        model_tflops_per_sec=round(achieved / 1e12, 2),
        mfu_vs_bf16_peak=round(achieved / PEAK_BF16, 4),
        finite_eps_chains=int(np.isfinite(eps).sum()))


# (tag, compute_dtype, warmup matmul precision, sampling precision)
ARMS = {'f32def': (None, None, None),
        'f32strict': (None, 'float32', 'float32'),
        'bf16fwd': ('bfloat16', None, None),
        'f32tune': (None, 'float32', None)}

# fault-shaped error text (same markers as nuts_fault_probe.py): the
# f32-precision tuner arms at width>=512 reproducibly kernel-fault the
# remote worker (tuner_w512_n65536_f32 bisect cell), so every arm runs
# in its own subprocess — a fault records a verdict instead of killing
# the surviving arms or poisoning the client.
FAULT_MARKERS = ('UNAVAILABLE', 'kernel fault', 'device error',
                 'FAILED_PRECONDITION', 'INTERNAL')


def run_child(tag: str) -> int:
    try:
        rec = run_arm(tag, *ARMS[tag])
    except Exception as exc:  # noqa: BLE001 — classify for the parent
        text = f'{type(exc).__name__}: {exc}'
        print(text[-2000:], file=sys.stderr)
        return 70 if any(m in text for m in FAULT_MARKERS) else 1
    print(json.dumps(rec))
    return 0


def main() -> int:
    import subprocess
    if len(sys.argv) > 2 and sys.argv[1] == '--arm':
        return run_child(sys.argv[2])

    done = set()
    if OUT.exists():
        done = {json.loads(line)['arm'] for line in
                OUT.read_text().splitlines() if line.strip()}
    OUT.parent.mkdir(parents=True, exist_ok=True)
    for tag in ARMS:
        arm_id = f'{tag}_w{WIDTH}'
        if arm_id in done:
            print(f'[dtype_ab] {tag}: already recorded, skip')
            continue
        print(f'[dtype_ab] {tag}: starting (isolated subprocess)')
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, __file__, '--arm', tag],
                capture_output=True, text=True, timeout=1800,
                env=dict(os.environ, MILE_AB_WIDTH=str(WIDTH)))
            rc, out, err = proc.returncode, proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as exc:
            rc, out, err = -1, '', f'timeout: {exc}'
        wall = time.time() - t0
        if rc == 0:
            rec = next(json.loads(line) for line in out.splitlines()
                       if line.startswith('{'))
        else:
            verdict = ('kernel_fault'
                       if rc == 70 or any(m in err for m in FAULT_MARKERS)
                       else ('timeout' if rc == -1 else 'error'))
            rec = dict(arm=arm_id, verdict=verdict, rc=rc,
                       wall_s=round(wall, 1), error=err[-2000:])
        with open(OUT, 'a') as f:
            f.write(json.dumps(rec) + '\n')
        print(f"[dtype_ab] {tag}: "
              f"{rec.get('verdict', 'ok')} in {wall:.0f}s")
        if rec.get('verdict') in ('kernel_fault', 'timeout'):
            print('[dtype_ab] cooling off 180s (tunnel recovery)')
            time.sleep(180)
    return 0


if __name__ == '__main__':
    sys.exit(main())
