"""Queue-harness containment behavior (experiments/run_catalog.py).

The catalogue runner is the layer that keeps multi-hour chip queues
alive through kernel faults AND client hangs (round-5: a crashed TPU
worker can leave the client dead-blocked in a gRPC wait with no
exception). These tests cover the device-free parts of that contract:
the two-strikes fault ledger (kernel-fault and hang strikes alike must
skip a job) and the --job-timeout watchdog plumbing.

Reference parity note: the reference has no queue harness at all (its
experiments are launched one-by-one from YAML); this subsystem is
SURVEY §5.3 failure-handling surface.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / 'experiments'))

import run_catalog  # noqa: E402


def _run_main(argv, monkeypatch):
    monkeypatch.setattr(sys, 'argv', ['run_catalog.py', *argv])
    return run_catalog.main()


def test_two_strikes_skips_job_without_running_it(tmp_path, monkeypatch):
    """A job with >=2 ledger strikes is skipped before any device work."""
    root = tmp_path / 'catalog'
    root.mkdir()
    strikes = [
        {'study': 'datasize', 'job': 'protein_nuts_n40000_r1',
         'wall_s': 242.0},
        {'study': 'datasize', 'job': 'protein_nuts_n40000_r1',
         'wall_s': 1800.0, 'hang': True},  # hang strikes count too
    ]
    (root / 'FAULTS.jsonl').write_text(
        ''.join(json.dumps(s) + '\n' for s in strikes))

    # if the skip logic failed, main() would construct a BDETrainer and
    # try to run on the device — poison the class to make that loud
    class Boom:
        def __init__(self, *a, **k):
            raise AssertionError('skipped job must never build a trainer')

    import mile_tpu.train.trainer as trainer_mod
    monkeypatch.setattr(trainer_mod, 'BDETrainer', Boom)

    rc = _run_main(['--root', str(root), '--only', 'datasize',
                    '--name-filter', r'^protein_nuts_n40000_r1$'], monkeypatch)
    assert rc == 0  # skipped-only queue completes cleanly
    assert not (root / 'datasize').exists()


def test_legacy_bare_name_strikes_also_count(tmp_path, monkeypatch):
    """Pre-round-5 ledger entries keyed by bare job name still skip."""
    root = tmp_path / 'catalog'
    root.mkdir()
    (root / 'FAULTS.jsonl').write_text(
        json.dumps({'job': 'protein_nuts_n40000_r1', 'wall_s': 1.0}) + '\n'
        + json.dumps({'study': 'datasize', 'job': 'protein_nuts_n40000_r1',
                      'wall_s': 2.0}) + '\n')
    rc = _run_main(['--root', str(root), '--only', 'datasize',
                    '--name-filter', r'^protein_nuts_n40000_r1$'], monkeypatch)
    assert rc == 0
    assert not (root / 'datasize').exists()


def test_job_timeout_flag_parses_and_dry_run_lists_jobs(tmp_path,
                                                        monkeypatch,
                                                        capsys):
    rc = _run_main(['--root', str(tmp_path / 'x'), '--only', 'datasize',
                    '--name-filter', 'nuts', '--dry-run',
                    '--job-timeout', '5'], monkeypatch)
    assert rc == 0
    out = capsys.readouterr().out
    assert '15 jobs' in out
    assert 'protein_nuts_n5000_r3' in out


def test_single_strike_does_not_skip(tmp_path, monkeypatch):
    """One transient strike must not cost study coverage: the job runs
    (here: reaches trainer construction, which we intercept)."""
    root = tmp_path / 'catalog'
    root.mkdir()
    (root / 'FAULTS.jsonl').write_text(
        json.dumps({'study': 'datasize', 'job': 'protein_nuts_n40000_r1',
                    'wall_s': 242.0}) + '\n')

    ran = []

    class Recorder:
        def __init__(self, cfg):
            ran.append(cfg.experiment_name)
            raise RuntimeError('stop before any device work')

    import mile_tpu.train.trainer as trainer_mod
    monkeypatch.setattr(trainer_mod, 'BDETrainer', Recorder)

    rc = _run_main(['--root', str(root), '--only', 'datasize',
                    '--name-filter', r'^protein_nuts_n40000_r1$'], monkeypatch)
    assert ran == ['protein_nuts_n40000_r1']
    assert rc == 1  # one failed (our RuntimeError), queue still completed
