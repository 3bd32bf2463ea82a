"""Round-3 catalogue runner: the reference's full study grid, serially.

Executes the reference's experiment catalogue
(/root/reference/experiments/{tabluar_classif,hyper_params_ablation,
complexity_ablation,datasize_ablation,feasibility,diagnostics}) on the
chip, one experiment at a time in ONE process (the remote-compile tunnel
tolerates no concurrency — CLAUDE.md operational notes), with:

- resume: a job whose experiment dir already holds metrics.pkl is
  skipped, so the queue can be re-launched after an interruption;
- warmstart reuse: sampler-knob sweeps share one deep-ensemble
  warmstart per (dataset, architecture, seed) via warmstart_exp_dir —
  the reference supports exactly this reuse (config/warmstart.py:55-57);
- priority ordering: classification suite first, then the hyper-param
  grids, complexity, datasize, feasibility, diagnostics — a partially
  completed queue still yields complete high-priority studies.

Usage:  python experiments/run_catalog.py [--only STUDY[,STUDY]]
        [--dry-run] [--root results/catalog_r3]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import re
import shutil
import sys
import threading
import time
import traceback
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logger = logging.getLogger('catalog')

CLASSIF_DATASETS = ['sonar', 'heart', 'glass', 'australian', 'ionosphere',
                    'wine_red', 'wine_white']  # covertype: data blob missing
CLASSIF_SEEDS = [1, 2, 3, 4, 5]          # reference repl_search.yaml
ABLATION_SEEDS = [1, 2, 3]

# reference search_desired_energy_var.yaml grid
EV_STARTS = [0.1, 0.5, 1.0, 10.0, 100.0]
EV_ENDS = [0.1, 0.05]
TRUSTS = [2.5, 2.0, 1.5, 1.0, 0.5]       # search_trust_in_estimate.yaml
ESS_TARGETS = [10, 50, 100, 150, 200]    # search_ess.yaml
WARMUP_BUDGETS = [10000, 50000, 100000, 150000, 200000]  # search_warmstart_budget
COMPLEXITY_STRUCTS = [[8, 8, 8, 2], [16, 16, 16, 2], [32, 32, 32, 2],
                      [48, 48, 48, 2]]   # complexity_search.yaml
DATASIZE_LIMITS = [40000, 30000, 20000, 10000, 5000]  # datasize_search.yaml
FEAS_DATASETS = ['airfoil', 'concrete', 'energy', 'yacht', 'bikesharing',
                 'protein']              # feas_search.yaml
DIAG_DATASETS = ['airfoil', 'bikesharing', 'energy']  # diagnostics_search


def _set(cfg, path: str, value):
    """dataclasses.replace along a dotted path on nested frozen configs."""
    head, _, rest = path.partition('.')
    if rest:
        value = _set(getattr(cfg, head), rest, value)
    return dataclasses.replace(cfg, **{head: value})


def _load(path: str):
    from mile_tpu.config import Config

    cfgs = Config.from_file(path)
    assert len(cfgs) == 1, path
    return cfgs[0]


class Job:
    def __init__(self, study: str, name: str, base: str, overrides: dict,
                 warmstart_from: str | None = None):
        self.study, self.name, self.base = study, name, base
        self.overrides = overrides
        # job NAME within same study, or 'other_study/name' for a
        # cross-study provider (always resolved against --root so the
        # queue is relocatable; ADVICE r3 medium finding)
        self.warmstart_from = warmstart_from

    def exp_dir(self, root: Path) -> Path:
        return root / self.study / self.name

    def warmstart_dir(self, root: Path) -> Path | None:
        if self.warmstart_from is None:
            return None
        if '/' in self.warmstart_from:
            return root / self.warmstart_from
        return root / self.study / self.warmstart_from

    def config(self, root: Path):
        cfg = _load(self.base)
        cfg = _set(cfg, 'saving_dir', str(root / self.study))
        cfg = _set(cfg, 'experiment_name', self.name)
        for path, value in self.overrides.items():
            cfg = _set(cfg, path, value)
        ws = self.warmstart_dir(root)
        if ws is not None:
            cfg = _set(cfg, 'training.warmstart.warmstart_exp_dir', str(ws))
        return cfg


def build_jobs() -> list[Job]:
    jobs: list[Job] = []

    # ---- 1. tabular classification suite (ref tabluar_classif/, rng 1-5)
    for ds in CLASSIF_DATASETS:
        for rng in CLASSIF_SEEDS:
            jobs.append(Job('tabular_classif', f'{ds}_mclmc_r{rng}',
                            f'configs/tabular_classif/{ds}.yaml',
                            {'rng': rng}))

    # ---- 2. hyper-parameter ablations (ref hyper_params_ablation/)
    base = 'configs/ablations/complexity_bike_mclmc.yaml'  # same bike base
    for rng in ABLATION_SEEDS:
        # the (0.5, 0.1) energy point doubles as the warmstart provider
        jobs.append(Job('hyper_params', f'bike_mclmc_ev0.5_0.1_r{rng}',
                        base, {'rng': rng}))
    for rng in ABLATION_SEEDS:
        provider = f'bike_mclmc_ev0.5_0.1_r{rng}'
        for s in EV_STARTS:
            for e in EV_ENDS:
                if (s, e) == (0.5, 0.1):
                    continue  # provider covers it
                jobs.append(Job(
                    'hyper_params', f'bike_mclmc_ev{s}_{e}_r{rng}', base,
                    {'rng': rng,
                     'training.sampler.desired_energy_var_start': s,
                     'training.sampler.desired_energy_var_end': e},
                    warmstart_from=provider))
        for t in TRUSTS:
            if t == 1.5:
                continue
            jobs.append(Job(
                'hyper_params', f'bike_mclmc_trust{t}_r{rng}', base,
                {'rng': rng, 'training.sampler.trust_in_estimate': t},
                warmstart_from=provider))
        for n in ESS_TARGETS:
            if n == 100:
                continue
            jobs.append(Job(
                'hyper_params', f'bike_mclmc_ess{n}_r{rng}', base,
                {'rng': rng, 'training.sampler.num_effective_samples': n},
                warmstart_from=provider))
        for w in WARMUP_BUDGETS:
            if w == 50000:
                continue
            jobs.append(Job(
                'hyper_params', f'bike_mclmc_wu{w}_r{rng}', base,
                {'rng': rng, 'training.sampler.warmup_steps': w},
                warmstart_from=provider))
        jobs.append(Job('hyper_params', f'bike_nuts_baseline_r{rng}',
                        'configs/ablations/complexity_bike_nuts.yaml',
                        {'rng': rng}, warmstart_from=provider))
        jobs.append(Job('hyper_params', f'bike_de_r{rng}',
                        'configs/ablations/complexity_bike_de.yaml',
                        {'rng': rng}))  # own optimizer -> own warmstart

    # ---- 3. complexity ablation (ref complexity_ablation/)
    for struct in COMPLEXITY_STRUCTS:
        tag = 'x'.join(str(w) for w in struct[:-1])
        for rng in ABLATION_SEEDS:
            provider = f'bike_mclmc_{tag}_r{rng}'
            jobs.append(Job('complexity', provider,
                            'configs/ablations/complexity_bike_mclmc.yaml',
                            {'rng': rng, 'model.hidden_structure': struct}))
            nuts_over = {'rng': rng, 'model.hidden_structure': struct}
            if max(struct) >= 44:
                # 44+-width NUTS faults the remote TPU in the depth-10
                # window-adaptation program (round-5 fault probe). The
                # warmup-only cap passed the 50-draw probe but the real
                # 1000-draw protein-40k run (same fault family) still
                # crashed the worker, so cap BOTH phases at 8 — the
                # probe-verified-ok configuration. The cap is recorded
                # in the pooled CSV columns; 8/16/32-width companions
                # keep full depth 10.
                nuts_over['training.sampler.warmup_max_num_doublings'] = 8
                nuts_over['training.sampler.max_num_doublings'] = 8
            jobs.append(Job('complexity', f'bike_nuts_{tag}_r{rng}',
                            'configs/ablations/complexity_bike_nuts.yaml',
                            nuts_over, warmstart_from=provider))
            jobs.append(Job('complexity', f'bike_de_{tag}_r{rng}',
                            'configs/ablations/complexity_bike_de.yaml',
                            {'rng': rng, 'model.hidden_structure': struct}))

    # ---- 4. datasize ablation (ref datasize_ablation/)
    for limit in DATASIZE_LIMITS:
        for rng in ABLATION_SEEDS:
            provider = f'protein_mclmc_n{limit}_r{rng}'
            jobs.append(Job('datasize', provider,
                            'configs/ablations/datasize_protein_mclmc.yaml',
                            {'rng': rng, 'data.datapoint_limit': limit}))
            jobs.append(Job('datasize', f'protein_nuts_n{limit}_r{rng}',
                            'configs/ablations/datasize_protein_nuts.yaml',
                            # depth cap 8 on BOTH phases, WHOLE arm (not
                            # just the faulting 40k cells) so the
                            # datasize axis is internally consistent.
                            # Warmup-only capping (full-depth sampling)
                            # was probe-ok on 50-draw bike48 but still
                            # faulted the real 1000-draw protein-40k run
                            # (FAULTS.jsonl 2026-08-21); the both-phase
                            # cap is the probe-verified-ok cell
                            # protein_n40000_mnd8.
                            {'rng': rng, 'data.datapoint_limit': limit,
                             'training.sampler'
                             '.warmup_max_num_doublings': 8,
                             'training.sampler'
                             '.max_num_doublings': 8},
                            warmstart_from=provider))

    # ---- 4a2. MCLMC matmul-dtype A/B on the headline airfoil config
    # (VERDICT r4 next 4): default bf16 matmul passes vs strict-f32
    # matmuls vs bf16 forward-activations. Quantifies what the fast path
    # costs in tuned (eps, L) drift and LPPD; pooled rows carry
    # step_size_mean/L_mean so the drift is one groupby away.
    for rng in ABLATION_SEEDS:
        for tag, overrides in (
                # fully-default-bf16 arm: pin warmup precision back to
                # "follow matmul_precision" (the pre-round-5 default;
                # since the A/B, f32-tuner is the framework default)
                ('f32def',
                 {'training.sampler.warmup_matmul_precision': None}),
                ('f32strict',
                 {'training.sampler.matmul_precision': 'float32'}),
                ('bf16fwd',
                 {'training.sampler.compute_dtype': 'bfloat16',
                  'training.sampler.warmup_matmul_precision': None}),
                # f32 TUNER + fast bf16-pass sampling: MCLMC's sampling
                # phase never reads energies, so the quality win of
                # exact-f32 tuning survives at full default speed —
                # now the framework default
                ('f32tune',
                 {'training.sampler'
                  '.warmup_matmul_precision': 'float32'})):
            jobs.append(Job(
                'dtype_ab', f'airfoil_mclmc_{tag}_r{rng}',
                'configs/illustrative_airfoil_mclmc.yaml',
                {'rng': rng, **overrides}))

    # ---- 4b. NUTS target-acceptance sweep (VERDICT r3 next 3: baseline
    # 0.8 leaves 5-6% divergent draws; sweep 0.9/0.95 and pick a
    # divergence-aware default). Providers are the complexity-study
    # 16x16x16 MCLMC warmstarts, resolved against --root (ADVICE r3).
    # 0.8 rows make the study CSV self-contained (VERDICT r4 weak 4: the
    # baseline the 0.9 default decision was made against must live in the
    # same table, run under the same harness)
    for rng in ABLATION_SEEDS:
        for ta in (0.8, 0.9, 0.95):
            jobs.append(Job(
                'nuts_ta', f'bike_nuts_ta{int(ta * 100)}_r{rng}',
                'configs/ablations/complexity_bike_nuts.yaml',
                {'rng': rng, 'training.sampler.target_acceptance': ta},
                warmstart_from=f'complexity/bike_mclmc_16x16x16_r{rng}'))

    # ---- 4c. UCI regression dataset sweep (ref experiments/dataset/ and
    # VERDICT r3 next 4: one table over the full 6-dataset suite with
    # seeds; r2 covered concrete/energy/yacht single-seed). Each MCLMC
    # run also records its own deep-ensemble (de_lppd) baseline.
    for ds in FEAS_DATASETS:
        for rng in ABLATION_SEEDS:
            jobs.append(Job('dataset', f'uci_mclmc_{ds}_r{rng}',
                            'configs/replicate_uci/mclmc.yaml',
                            {'rng': rng, 'data.path': f'data/{ds}.data'}))

    # ---- 5. feasibility (ref feasibility/: 10-layer FCN, 6 datasets).
    # The reference arm is the NAIVE config (feas.yaml
    # 'mclmc_naive_run_10_layers') — on chip it diverges to NaN LPPD on
    # deep nets, which IS the study's point. The feas_tuned companion
    # (beyond reference) runs the same net through the tuned pipeline
    # with diagonal preconditioning to show the framework's fix.
    for ds in FEAS_DATASETS:
        jobs.append(Job('feasibility', f'feas_mclmc_{ds}',
                        'configs/feasibility/feas.yaml',
                        {'data.path': f'data/{ds}.data'}))
        jobs.append(Job(
            'feasibility', f'feas_tuned_{ds}',
            'configs/feasibility/feas.yaml',
            {'data.path': f'data/{ds}.data',
             'training.sampler.diagonal_preconditioning': True},
            warmstart_from=f'feas_mclmc_{ds}'))
        # second probe: preconditioning did NOT rescue the collapse, so
        # test the numerics hypothesis — 10 layers of default-bf16
        # matmuls may bury the tuner's energy-variance signal the same
        # way they buried the NUTS MH signal (r2). f32 compute for the
        # whole sampler:
        jobs.append(Job(
            'feasibility', f'feas_f32_{ds}',
            'configs/feasibility/feas.yaml',
            {'data.path': f'data/{ds}.data',
             'training.sampler.diagonal_preconditioning': True,
             'training.sampler.compute_dtype': 'float32'},
            warmstart_from=f'feas_mclmc_{ds}'))

    # ---- 6. diagnostics study (ref diagnostics/: deep-8 FCN, 3 datasets)
    for ds in DIAG_DATASETS:
        for rng in ABLATION_SEEDS:
            provider = f'diag_mclmc_{ds}_r{rng}'
            jobs.append(Job('diagnostics', provider,
                            'configs/diagnostics_study.yaml',
                            {'rng': rng, 'data.path': f'data/{ds}.data'}))
            jobs.append(Job('diagnostics', f'diag_nuts_{ds}_r{rng}',
                            'configs/diagnostics_nuts.yaml',
                            {'rng': rng, 'data.path': f'data/{ds}.data'},
                            warmstart_from=provider))
    return jobs


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument('--root', default='results/catalog_r3')
    p.add_argument('--only', default=None,
                   help='comma-separated study filter')
    p.add_argument('--dry-run', action='store_true')
    p.add_argument('--limit', type=int, default=None)
    p.add_argument('--job-timeout', type=float, default=1800.0,
                   help='hard per-job wall limit (s); a job exceeding it '
                        'is treated as a device hang: strike + exit 70')
    p.add_argument('--name-filter', default=None,
                   help='regex on job name (e.g. "_r1$" runs one seed of '
                        'every SEEDED grid point — note feasibility jobs '
                        'carry no _r<N> suffix and would be dropped)')
    p.add_argument('--mclmc-first', action='store_true',
                   help='run every MCLMC job (the warmstart providers) '
                        'before DE, before NUTS, within the filtered set — '
                        'an interrupted queue then holds COMPLETE cheap '
                        'grids instead of interleaved fragments')
    args = p.parse_args()

    root = Path(args.root)
    jobs = build_jobs()
    if args.only:
        keep = set(args.only.split(','))
        jobs = [j for j in jobs if j.study in keep]
    if args.name_filter:
        jobs = [j for j in jobs if re.search(args.name_filter, j.name)]
    if args.mclmc_first:
        def rank(j: Job) -> int:
            return 0 if 'mclmc' in j.name or j.study == 'feasibility' \
                else (1 if '_de' in j.name else 2)
        jobs = sorted(jobs, key=rank)  # stable sort keeps intra-class order
    if args.limit:
        jobs = jobs[:args.limit]

    if args.dry_run:
        for j in jobs:
            print(f'{j.study:16s} {j.name:34s} ws<-{j.warmstart_from}')
        print(f'{len(jobs)} jobs')
        return 0

    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(levelname)s %(message)s')
    os.makedirs('/tmp/mile_tpu_jax_cache', exist_ok=True)
    import jax

    jax.config.update('jax_compilation_cache_dir', '/tmp/mile_tpu_jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from mile_tpu.train.trainer import BDETrainer

    qlog = open(root / 'queue.jsonl', 'a') if root.exists() else None
    root.mkdir(parents=True, exist_ok=True)
    if qlog is None:
        qlog = open(root / 'queue.jsonl', 'a')

    # two-strikes device-fault ledger: a job that faulted the device in
    # >=2 previous processes is skipped so a deterministic kernel fault
    # can't pin every relaunch on the same job
    fault_log = root / 'FAULTS.jsonl'
    fault_counts: dict[str, int] = {}
    if fault_log.exists():
        for line in fault_log.read_text().splitlines():
            rec = json.loads(line)
            # ledger keyed by study/job (old entries lack 'study': keep
            # keying those by bare name for backward compat — ADVICE r4)
            key = (f"{rec['study']}/{rec['job']}" if 'study' in rec
                   else rec['job'])
            fault_counts[key] = fault_counts.get(key, 0) + 1

    done = skipped = failed = 0
    stopped = False
    for i, job in enumerate(jobs):
        strikes = (fault_counts.get(f'{job.study}/{job.name}', 0)
                   + fault_counts.get(job.name, 0))
        if strikes >= 2:
            logger.error('[%d/%d] %s skipped: faulted the device %d times '
                         '(see %s)', i + 1, len(jobs), job.name,
                         strikes, fault_log)
            skipped += 1
            continue
        if (root / 'STOP').exists():
            stopped = True
            # clean shutdown between jobs (never mid-compile: killing a
            # client mid-remote-compile wedges the tunnel ~30 min).
            # Consume the file so the NEXT launch runs (ADVICE r3 low).
            (root / 'STOP').unlink()
            logger.info('STOP file found (consumed); exiting after %d done',
                        done)
            break
        exp_dir = job.exp_dir(root)
        if (exp_dir / 'metrics.pkl').exists():
            skipped += 1
            continue
        if exp_dir.exists():
            # incomplete leftover from a previous crash — redo cleanly
            # (setup_dir would otherwise timestamp-suffix a duplicate)
            shutil.rmtree(exp_dir)
        ws_dir = job.warmstart_dir(root)
        if ws_dir is not None and not (ws_dir / 'warmstart').exists():
            logger.error('[%d/%d] %s: warmstart provider %s missing; '
                         'running WITHOUT reuse', i + 1, len(jobs),
                         job.name, job.warmstart_from)
            job.warmstart_from = None
        logger.info('[%d/%d] %s/%s starting', i + 1, len(jobs), job.study,
                    job.name)
        t0 = time.time()

        # Hang watchdog (round 5): a crashed TPU worker can leave the
        # client dead-blocked in a gRPC wait forever (observed
        # 2026-08-21: protein_nuts_n30000_r2 froze 25+ min with zero CPU
        # after 'starting nuts sampling', no exception raised). Python
        # can't interrupt a thread blocked in C++, so a timer thread
        # records a fault-ledger strike and hard-exits 70 — the same
        # relaunch path a raised kernel fault takes.
        def _hang_exit(job=job, t0=t0):
            wall = round(time.time() - t0, 1)
            logger.error('%s HUNG for %.0fs — recording strike and '
                         'exiting 70 for relaunch', job.name, wall)
            with open(fault_log, 'a') as f:
                f.write(json.dumps({'study': job.study, 'job': job.name,
                                    'wall_s': wall, 'hang': True}) + '\n')
            if qlog:
                qlog.write(json.dumps({'job': job.name, 'study': job.study,
                                       'ok': False, 'wall_s': wall,
                                       'error': 'hang'}) + '\n')
                qlog.flush()
            os._exit(70)

        watchdog = threading.Timer(args.job_timeout, _hang_exit)
        watchdog.daemon = True
        watchdog.start()
        try:
            cfg = job.config(root)
            trainer = BDETrainer(cfg)
            metrics = trainer.train(report=True)
            wall = time.time() - t0
            done += 1
            rec = {'job': job.name, 'study': job.study, 'ok': True,
                   'wall_s': round(wall, 1),
                   'lppd': metrics.get('lppd'),
                   'de_lppd': metrics.get('de_lppd'),
                   'acc': metrics.get('acc'), 'rmse': metrics.get('rmse')}
        except Exception as exc:  # keep the queue alive
            wall = time.time() - t0
            failed += 1
            logger.error('[%d/%d] %s FAILED after %.0fs:\n%s',
                         i + 1, len(jobs), job.name, wall,
                         traceback.format_exc())
            rec = {'job': job.name, 'study': job.study, 'ok': False,
                   'wall_s': round(wall, 1), 'error': repr(exc)}
            text = repr(exc)
            is_fault = ('kernel fault' in text or 'device error' in text
                        or 'FAILED_PRECONDITION' in text)
            if is_fault or 'UNAVAILABLE' in text:
                # a device fault poisons THIS process: every further job
                # insta-fails (observed: one protein-NUTS kernel fault
                # burned 14 queued jobs in 6 s). Bail out with a distinct
                # code so a wrapper can relaunch a fresh process that
                # resumes via the skip logic. Only KERNEL-FAULT-shaped
                # errors count a ledger strike — gRPC also says
                # UNAVAILABLE for transient tunnel blips, and two blips
                # must not permanently skip a healthy job (ADVICE r4).
                qlog.write(json.dumps(rec) + '\n')
                qlog.flush()
                if is_fault:
                    with open(fault_log, 'a') as f:
                        f.write(json.dumps({'study': job.study,
                                            'job': job.name,
                                            'wall_s': round(wall, 1)})
                                + '\n')
                logger.error('device %s — exiting for relaunch '
                             '(done=%d skip=%d fail=%d)',
                             'fault' if is_fault else 'unavailable',
                             done, skipped, failed)
                return 70
        finally:
            watchdog.cancel()
        qlog.write(json.dumps(rec) + '\n')
        qlog.flush()
        logger.info('[%d/%d] %s done in %.0fs (done=%d skip=%d fail=%d)',
                    i + 1, len(jobs), job.name, wall, done, skipped, failed)
    logger.info('queue complete: %d done, %d skipped, %d failed',
                done, skipped, failed)
    if stopped:
        return 75  # tells a multi-stage wrapper script to stop the pipeline
    return 0 if failed == 0 else 1


if __name__ == '__main__':
    sys.exit(main())
