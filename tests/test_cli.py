"""CLI surface tests (argument handling, grid expansion, multihost flag).

`_run_one` is stubbed out — end-to-end training through the CLI is
covered by the driver's verify flow; here we pin the dispatch logic.
"""
import pytest

from mile_tpu import cli


@pytest.fixture
def capture_runs(monkeypatch):
    runs = []
    monkeypatch.setattr(cli, '_run_one',
                        lambda cfg, n, no_report: runs.append(cfg))
    return runs


def test_missing_config_errors(capsys):
    with pytest.raises(SystemExit) as exc:
        cli.main(['-c', 'configs/does_not_exist.yaml'])
    assert exc.value.code == 2
    assert 'config not found' in capsys.readouterr().err


def test_single_experiment_dispatch(capture_runs):
    assert cli.main(['-c', 'configs/debug.yaml', '--no_report',
                     '--jax_cache', '']) == 0
    assert len(capture_runs) == 1
    assert capture_runs[0].experiment_name == 'debug'


def test_search_tree_expansion_dispatch(capture_runs):
    assert cli.main(['-c', 'configs/replicate_uci/mclmc.yaml',
                     '-s', 'configs/replicate_uci/seeds_search.yaml',
                     '--jax_cache', '']) == 0
    assert len(capture_runs) > 1
    assert len({c.experiment_name for c in capture_runs}) == len(capture_runs)


def test_multihost_flag_falls_back_single_process(capture_runs):
    # no coordinator configured -> initialize_distributed degrades to
    # single-process and the experiment still dispatches
    assert cli.main(['-c', 'configs/debug.yaml', '--multihost',
                     '--jax_cache', '']) == 0
    assert len(capture_runs) == 1
