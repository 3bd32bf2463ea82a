#!/usr/bin/env python
"""Minimal repro + bisect + mitigation sweep for the remote NUTS kernel
fault (VERDICT r4 next 2).

Round 4 observed (aggr_results/faults_snapshot.jsonl): NUTS programs on
bikesharing at FCN width 48x48x48 and on protein at datapoint limits
30k/40k crash the remote TPU worker ("UNAVAILABLE: ... kernel fault"),
poisoning the whole client process. MCLMC runs the same posteriors fine,
so the trigger is NUTS-program-shaped (nested while_loops with
(max_depth, dim) checkpoint buffers), not the posterior itself.

Every cell runs in a fresh SUBPROCESS: a kernel fault kills only that
child (exit 70), the parent records the verdict and cools off before the
next cell, and tuned state can never be poisoned across cells. Results
append to ``aggr_results/nuts_fault_probe.jsonl``.

Modes:
  --repro            the one smallest known-faulting cell (bike 48^3)
  --bisect           width bisect on bike (16..48) + datapoint bisect on
                     protein (5k..40k), short programs
  --mitigations      the faulting cells under candidate mitigations:
                     max_num_doublings cap, likelihood chunking, bf16
                     forward, fewer chains, warmup-only / sampling-only
  --cell JSON        (internal) run one cell in-process

Reference study cells this unblocks:
/root/reference/experiments/datasize_ablation/datasize_search.yaml and
complexity_ablation/ 48-width NUTS rows.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

OUT = ROOT / 'aggr_results' / 'nuts_fault_probe.jsonl'
FAULT_MARKERS = ('UNAVAILABLE', 'kernel fault', 'device error',
                 'FAILED_PRECONDITION', 'INTERNAL')

BIKE = dict(path='data/bikesharing.data', train_split=0.7,
            valid_split=0.1, test_split=0.2)
PROTEIN = dict(path='data/protein.data', train_split=0.9,
               valid_split=0.05, test_split=0.05)


def _cells_repro():
    return [dict(name='bike48_repro', data=BIKE, width=48, n_draws=50)]


def _cells_bisect():
    cells = [dict(name=f'bike{w}_bisect', data=BIKE, width=w, n_draws=50)
             for w in (16, 32, 40, 44, 48)]
    cells += [dict(name=f'protein_n{n}_bisect', data=PROTEIN, width=16,
                   datapoint_limit=n, n_draws=50)
              for n in (5000, 10000, 20000, 30000, 40000)]
    return cells


def _cells_tuner_bisect():
    """Second fault family (found round 5): the MCLMC TUNER program on
    the synthetic wide-FCN workload faults at 65k rows x width 512/1024
    (airfoil/bike/protein tuners, <=36k rows x width <=48, are fine).
    Bisect rows and the remat likelihood chunking at width 512."""
    cells = [dict(name=f'tuner_w512_n{n}', sampler='mclmc_tuner',
                  synthetic=dict(rows=n, feat=128), width=512,
                  likelihood_chunk_size=8192)
             for n in (8192, 16384, 32768, 65536)]
    cells += [dict(name=f'tuner_w512_n65536_chunk{c}',
                   sampler='mclmc_tuner',
                   synthetic=dict(rows=65536, feat=128), width=512,
                   likelihood_chunk_size=c)
              for c in (None, 2048, 16384)]
    cells.append(dict(name='tuner_w512_n65536_f32',
                      sampler='mclmc_tuner',
                      synthetic=dict(rows=65536, feat=128), width=512,
                      likelihood_chunk_size=8192,
                      warmup_matmul_precision='float32'))
    return cells


def _cells_verify_mitigation():
    """The production mitigation (warmup trees capped at 8, sampling at
    full depth 10) on both previously-faulting cells, through the real
    run_hmc_family path."""
    return [
        dict(name='bike48_warmupcap8', data=BIKE, width=48, n_draws=50,
             warmup_max_num_doublings=8),
        dict(name='protein_n40000_warmupcap8', data=PROTEIN, width=16,
             datapoint_limit=40000, n_draws=50,
             warmup_max_num_doublings=8),
    ]


def _cells_mitigations():
    cells = []
    for base, tag in ((dict(data=BIKE, width=48), 'bike48'),
                      (dict(data=PROTEIN, width=16,
                            datapoint_limit=40000), 'protein_n40000')):
        cells += [
            dict(name=f'{tag}_mnd8', max_num_doublings=8, **base),
            dict(name=f'{tag}_mnd6', max_num_doublings=6, **base),
            dict(name=f'{tag}_chunk4096', likelihood_chunk_size=4096,
                 **base),
            dict(name=f'{tag}_bf16', compute_dtype='bfloat16', **base),
            dict(name=f'{tag}_6chains', n_chains=6, **base),
            dict(name=f'{tag}_warmup_only', phase='warmup', **base),
            dict(name=f'{tag}_sampling_only', phase='sampling', **base),
        ]
        for c in cells:
            c.setdefault('n_draws', 50)
    return cells


# --------------------------------------------------------------- child
def run_cell(cell: dict) -> dict:
    """One probe cell, in-process. Returns a result record; device faults
    raise (the parent classifies them from this process's exit)."""
    import jax

    if os.environ.get('MILE_PROBE_CPU'):  # offline validation of the
        jax.config.update('jax_platforms', 'cpu')  # harness itself
    import jax.numpy as jnp

    os.makedirs('/tmp/mile_tpu_jax_cache', exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', '/tmp/mile_tpu_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from mile_tpu.bayes import BayesianModel, Prior
    from mile_tpu.config import (DataConfig, FCNConfig, PriorDist,
                                 SamplerConfig, Task)
    from mile_tpu.config.training import Sampler
    from mile_tpu.data import TabularLoader
    from mile_tpu.models import build_model
    from mile_tpu.train.sampling_hmc import run_hmc_family

    w = cell['width']
    if cell.get('synthetic'):
        import numpy as np

        rs = np.random.RandomState(0)
        rows, feat = cell['synthetic']['rows'], cell['synthetic']['feat']
        x = jnp.asarray(rs.rand(rows, feat).astype(np.float32))
        y = jnp.asarray(rs.rand(rows).astype(np.float32))
    else:
        data_cfg = DataConfig(task=Task.REGRESSION,
                              datapoint_limit=cell.get('datapoint_limit'),
                              **cell['data'])
        loader = TabularLoader(data_cfg, 0)
        x, y = loader.arrays('train')
    module = build_model(FCNConfig(hidden_structure=[w, w, w, 2]))
    template = module.init(jax.random.PRNGKey(1), x[:1])['params']
    bayes = BayesianModel(
        module, template, Prior.from_name(PriorDist.STANDARD_NORMAL),
        Task.REGRESSION,
        likelihood_chunk_size=cell.get('likelihood_chunk_size'),
        compute_dtype=cell.get('compute_dtype'))
    logdensity = bayes.logdensity_fn(x, y)

    n_chains = cell.get('n_chains', 12)
    phase = cell.get('phase', 'both')
    cfg = SamplerConfig(
        name=Sampler.NUTS, warmup_steps=100, n_chains=n_chains,
        n_samples=cell.get('n_draws', 50), step_size_init=0.001,
        target_acceptance=0.8,
        max_num_doublings=cell.get('max_num_doublings', 10),
        warmup_max_num_doublings=cell.get('warmup_max_num_doublings'),
        likelihood_chunk_size=cell.get('likelihood_chunk_size'),
        compute_dtype=cell.get('compute_dtype'))
    keys = jax.random.split(jax.random.PRNGKey(2), n_chains)
    positions = jax.vmap(
        lambda k: 0.05 * jax.random.normal(k, (bayes.dim,)))(keys)

    rec = dict(cell=cell, dim=bayes.dim, n_train=int(x.shape[0]))
    t0 = time.time()
    if cell.get('sampler') == 'mclmc_tuner':
        # MCLMC tuner only (second fault family, round 5): 500 steps of
        # energy-variance adaptation on the synthetic wide-FCN posterior
        from mile_tpu.train.sampling import warmup_mclmc

        tcfg = SamplerConfig(
            warmup_steps=cell.get('warmup_steps', 500),
            n_chains=n_chains, n_samples=10, step_size_init=1e-4,
            desired_energy_var_start=0.5, desired_energy_var_end=0.1,
            likelihood_chunk_size=cell.get('likelihood_chunk_size'),
            compute_dtype=cell.get('compute_dtype'),
            # default None = the exact program that faulted (the f32
            # framework default postdates the fault); a cell can set
            # 'float32' to test whether precision changes the verdict
            warmup_matmul_precision=cell.get('warmup_matmul_precision'))
        import numpy as np

        _, params, _ = warmup_mclmc(logdensity, tcfg,
                                    jax.random.PRNGKey(3), positions)
        eps = np.asarray(params.step_size)
        rec['eps_mean'] = float(eps.mean())
        rec['finite_eps_chains'] = int(np.isfinite(eps).sum())
    elif phase == 'warmup':
        # window adaptation only: localizes which program faults
        from mile_tpu.mcmc import nuts
        from mile_tpu.mcmc.adaptation.window import run_window_adaptation

        def warmup_one(position, key):
            state = nuts.init(position, logdensity)
            kernel = nuts.build_kernel(
                logdensity, max_depth=cfg.max_num_doublings)
            return run_window_adaptation(
                kernel, state, key, cfg.warmup_steps,
                initial_step_size=cfg.step_size_init,
                target_acceptance_rate=cfg.target_acceptance)

        with jax.default_matmul_precision('float32'):
            out = jax.block_until_ready(
                jax.jit(jax.vmap(warmup_one))(positions, keys))
        rec['step_size'] = [round(float(v), 6)
                           for v in jnp.ravel(out[1])][:4]
    elif phase == 'sampling':
        # fixed-eps NUTS draws, no adaptation program at all
        from mile_tpu.mcmc import nuts

        kernel = nuts.build_kernel(logdensity,
                                   max_depth=cfg.max_num_doublings)

        def chain(key, position):
            state = nuts.init(position, logdensity)

            def step(state, k):
                state, info = kernel(k, state, jnp.asarray(1e-3),
                                     jnp.ones(bayes.dim))
                return state, info.acceptance_rate

            state, acc = jax.lax.scan(
                step, state, jax.random.split(key, cfg.n_samples))
            return state.position, acc

        with jax.default_matmul_precision('float32'):
            pos, acc = jax.block_until_ready(
                jax.jit(jax.vmap(chain))(keys, positions))
        rec['mean_acceptance'] = round(float(jnp.mean(acc)), 4)
    else:
        result = run_hmc_family(logdensity, cfg, jax.random.PRNGKey(3),
                                positions)
        rec['n_divergent'] = int(
            jnp.sum(jnp.asarray(result.info.get('is_divergent', 0))))
        rec['samples_finite'] = bool(jnp.all(jnp.isfinite(result.samples)))
    rec['wall_s'] = round(time.time() - t0, 1)
    rec['ok'] = True
    return rec


def dump_hlo(cell: dict) -> dict:
    """Characterize the faulting program WITHOUT running it: trace + lower
    the exact NUTS warmup/sampling computations of ``cell`` and report
    StableHLO statistics (op counts, while-loop nesting, largest buffer).
    Runs fine on CPU (tracing is backend-independent) — set
    MILE_PROBE_CPU=1 to keep the chip untouched."""
    import re

    import jax
    import jax.numpy as jnp

    if os.environ.get('MILE_PROBE_CPU'):
        jax.config.update('jax_platforms', 'cpu')

    from mile_tpu.bayes import BayesianModel, Prior
    from mile_tpu.config import DataConfig, FCNConfig, PriorDist, Task
    from mile_tpu.data import TabularLoader
    from mile_tpu.mcmc import nuts
    from mile_tpu.mcmc.adaptation.window import run_window_adaptation
    from mile_tpu.models import build_model

    w = cell['width']
    data_cfg = DataConfig(task=Task.REGRESSION,
                          datapoint_limit=cell.get('datapoint_limit'),
                          **cell['data'])
    loader = TabularLoader(data_cfg, 0)
    x, y = loader.arrays('train')
    module = build_model(FCNConfig(hidden_structure=[w, w, w, 2]))
    template = module.init(jax.random.PRNGKey(1), x[:1])['params']
    bayes = BayesianModel(
        module, template, Prior.from_name(PriorDist.STANDARD_NORMAL),
        Task.REGRESSION)
    logdensity = bayes.logdensity_fn(x, y)
    n_chains = cell.get('n_chains', 12)
    mnd = cell.get('max_num_doublings', 10)

    def warmup_one(position, key):
        state = nuts.init(position, logdensity)
        kernel = nuts.build_kernel(logdensity, max_depth=mnd)
        return run_window_adaptation(
            kernel, state, key, 100, initial_step_size=1e-3,
            target_acceptance_rate=0.8)

    keys = jax.random.split(jax.random.PRNGKey(2), n_chains)
    positions = jax.vmap(
        lambda k: 0.05 * jax.random.normal(k, (bayes.dim,)))(keys)
    with jax.default_matmul_precision('float32'):
        lowered = jax.jit(jax.vmap(warmup_one)).lower(positions, keys)
    text = lowered.as_text()
    ops = {op: len(re.findall(rf'stablehlo\.{op}\b', text))
           for op in ('while', 'dot_general', 'dynamic_update_slice',
                      'dynamic_slice', 'scatter', 'gather')}
    # nesting depth of while ops by brace tracking around stablehlo.while
    depth = cur = 0
    for line in text.splitlines():
        if 'stablehlo.while' in line:
            cur += 1
            depth = max(depth, cur)
        cur += line.count('{') - line.count('}')
        cur = max(cur, 0)
    shapes = [tuple(int(d) for d in m.group(1).split('x'))
              for m in re.finditer(r'tensor<((?:\d+x)+\d+)xf32>', text)]
    biggest = max(shapes, key=lambda s: int(np.prod(s))) if shapes else ()
    rec = dict(
        name=cell['name'] + '_hlo', dim=bayes.dim, n_train=int(x.shape[0]),
        n_chains=n_chains, max_num_doublings=mnd,
        hlo_bytes=len(text),
        n_while=ops['while'],
        max_while_nesting=depth,
        n_dot_general=ops['dot_general'],
        n_dynamic_update_slice=ops['dynamic_update_slice'],
        n_dynamic_slice=ops['dynamic_slice'],
        n_scatter=ops['scatter'], n_gather=ops['gather'],
        largest_f32_buffer=list(biggest),
        largest_f32_buffer_mib=round(
            float(np.prod(biggest)) * 4 / 2**20, 1) if biggest else 0.0)
    return rec


import numpy as np  # noqa: E402  (dump_hlo buffer stats)


# -------------------------------------------------------------- parent
def run_parent(cells, timeout_s: float, cooloff_s: float) -> int:
    OUT.parent.mkdir(parents=True, exist_ok=True)
    done = {json.loads(line)['name'] for line in
            OUT.read_text().splitlines()} if OUT.exists() else set()
    n_fault = 0
    for cell in cells:
        if cell['name'] in done:
            print(f"[probe] {cell['name']}: already recorded, skip")
            continue
        print(f"[probe] {cell['name']}: starting (timeout {timeout_s:.0f}s)")
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, __file__, '--cell', json.dumps(cell)],
                capture_output=True, text=True, timeout=timeout_s)
            rc = proc.returncode
            out, err = proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as exc:
            rc, out = -1, ''
            err = f'timeout after {timeout_s}s: {exc}'
        wall = time.time() - t0
        rec = dict(name=cell['name'], cell=cell, rc=rc,
                   wall_s=round(wall, 1))
        if rc == 0:
            for line in out.splitlines():
                if line.startswith('{'):
                    rec.update(json.loads(line))
            rec['verdict'] = 'ok'
        elif rc == 70 or any(m in err for m in FAULT_MARKERS):
            rec['verdict'] = 'kernel_fault'
            rec['error'] = err[-2000:]
            n_fault += 1
        elif rc == -1:
            rec['verdict'] = 'timeout'
            rec['error'] = err[-500:]
        else:
            rec['verdict'] = 'error'
            rec['error'] = err[-2000:]
        with open(OUT, 'a') as f:
            f.write(json.dumps(rec) + '\n')
        print(f"[probe] {cell['name']}: {rec['verdict']} in {wall:.0f}s")
        if rec['verdict'] in ('kernel_fault', 'timeout'):
            print(f'[probe] cooling off {cooloff_s:.0f}s '
                  f'(tunnel recovery)')
            time.sleep(cooloff_s)
    print(f'[probe] done; {n_fault} fault(s); results in {OUT}')
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--repro', action='store_true')
    ap.add_argument('--bisect', action='store_true')
    ap.add_argument('--mitigations', action='store_true')
    ap.add_argument('--verify-mitigation', action='store_true')
    ap.add_argument('--tuner-bisect', action='store_true')
    ap.add_argument('--cell', type=str, default=None)
    ap.add_argument('--hlo', type=str, default=None,
                    help='JSON cell: dump lowered-HLO statistics (no '
                         'execution; MILE_PROBE_CPU=1 keeps it off-chip)')
    ap.add_argument('--timeout', type=float, default=1800)
    ap.add_argument('--cooloff', type=float, default=180)
    args = ap.parse_args()

    if args.hlo:
        rec = dump_hlo(json.loads(args.hlo))
        print(json.dumps(rec))
        OUT.parent.mkdir(parents=True, exist_ok=True)
        with open(OUT, 'a') as f:
            f.write(json.dumps(rec) + '\n')
        return 0

    if args.cell:
        cell = json.loads(args.cell)
        try:
            rec = run_cell(cell)
        except Exception as exc:  # noqa: BLE001 — classified by repr
            text = repr(exc)
            print(text[-2000:], file=sys.stderr)
            return 70 if any(m in text for m in FAULT_MARKERS) else 1
        print(json.dumps(rec))
        return 0

    cells = []
    if args.repro:
        cells += _cells_repro()
    if args.bisect:
        cells += _cells_bisect()
    if args.mitigations:
        cells += _cells_mitigations()
    if args.verify_mitigation:
        cells += _cells_verify_mitigation()
    if args.tuner_bisect:
        cells += _cells_tuner_bisect()
    if not cells:
        print(__doc__)
        return 2
    return run_parent(cells, args.timeout, args.cooloff)


if __name__ == '__main__':
    sys.exit(main())
