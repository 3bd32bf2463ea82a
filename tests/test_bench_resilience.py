"""bench.py fault-resilience helpers (VERDICT r4 next 1b): device-fault
classification, retry/cool-off behavior, and the final-failure JSON
contract — all host-side, no chip required."""
import importlib
import json
import sys

import pytest


@pytest.fixture(scope='module')
def bench():
    sys.path.insert(0, '.')
    mod = importlib.import_module('bench')
    return mod


def test_fault_classification(bench):
    assert bench._is_device_fault(
        RuntimeError('FAILED_PRECONDITION: TPU backend error'))
    assert bench._is_device_fault(
        RuntimeError('UNAVAILABLE: kernel fault'))
    assert not bench._is_device_fault(ValueError('shape mismatch'))


def test_retries_reraise_non_fault(bench):
    calls = []

    def boom():
        calls.append(1)
        raise ValueError('not a device problem')

    with pytest.raises(ValueError):
        bench._with_retries(boom, 'x')
    assert len(calls) == 1  # no retry on non-fault errors


def test_retries_cool_off_then_succeed(bench, monkeypatch):
    monkeypatch.setattr(bench, 'BENCH_ATTEMPTS', 3)
    monkeypatch.setattr(bench, 'BENCH_COOLOFF_S', 0.0)
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError('UNAVAILABLE: device wedged')
        return 'ok'

    assert bench._with_retries(flaky, 'x') == 'ok'
    assert len(calls) == 3


def test_retries_final_failure_raises_fault(bench, monkeypatch):
    monkeypatch.setattr(bench, 'BENCH_ATTEMPTS', 2)
    monkeypatch.setattr(bench, 'BENCH_COOLOFF_S', 0.0)

    def always():
        raise RuntimeError('UNAVAILABLE: kernel fault')

    with pytest.raises(RuntimeError, match='kernel fault'):
        bench._with_retries(always, 'x')


def test_main_emits_parseable_json_on_failure(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, 'BENCH_ATTEMPTS', 1)
    monkeypatch.setattr(bench, 'BENCH_COOLOFF_S', 0.0)

    def always(*a, **k):
        raise RuntimeError('UNAVAILABLE: kernel fault')

    monkeypatch.setattr(bench, '_measure_throughput', always)
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 1
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)  # MUST be one parseable JSON line
    assert rec['metric'] == 'mclmc_airfoil_samples_per_sec'
    assert rec['value'] is None
    assert 'kernel fault' in rec['error']
