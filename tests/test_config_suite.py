"""Every shipped experiment config must load; every search tree must expand.

Mirrors the reference's experiment harness guarantee (SURVEY §2
"Experiment harness"): the YAML suite under ``configs/`` is part of the
product surface, so a schema change that orphans a config fails CI.
"""
import glob
from pathlib import Path

import pytest

from mile_tpu.config import Config

ROOT = Path(__file__).resolve().parents[1]
ALL_YAMLS = sorted(glob.glob(str(ROOT / 'configs' / '**' / '*.yaml'),
                             recursive=True))
SEARCH_TREES = [p for p in ALL_YAMLS if 'search' in Path(p).name]
FULL_CONFIGS = [p for p in ALL_YAMLS if p not in SEARCH_TREES]

OVERLAY_PAIRS = [
    ('configs/feasibility/feas.yaml',
     'configs/feasibility/feas_search.yaml'),
    ('configs/ablations/complexity_bike_mclmc.yaml',
     'configs/ablations/complexity_search.yaml'),
    ('configs/ablations/complexity_bike_mclmc.yaml',
     'configs/ablations/warmstart_budget_search.yaml'),
    ('configs/ablations/complexity_bike_mclmc.yaml',
     'configs/ablations/trust_in_estimate_search.yaml'),
    ('configs/ablations/complexity_bike_mclmc.yaml',
     'configs/ablations/ess_search.yaml'),
    ('configs/ablations/datasize_protein_mclmc.yaml',
     'configs/ablations/datasize_search.yaml'),
    ('configs/replicate_uci/mclmc.yaml',
     'configs/replicate_uci/seeds_search.yaml'),
    ('configs/replicate_uci/mclmc.yaml',
     'configs/replicate_uci/dataset_search.yaml'),
]


def test_suite_is_nonempty():
    assert len(FULL_CONFIGS) >= 30
    assert len(SEARCH_TREES) >= 8


@pytest.mark.parametrize('path', FULL_CONFIGS, ids=lambda p: Path(p).stem)
def test_config_loads(path):
    cfg = Config.from_yaml(path)
    assert cfg.experiment_name


@pytest.mark.parametrize('base,tree', OVERLAY_PAIRS,
                         ids=lambda p: Path(p).stem)
def test_search_tree_expands(base, tree):
    cfgs = Config.from_yaml(str(ROOT / base)).expand_grid_from_path(
        str(ROOT / tree))
    assert len(cfgs) > 1
    names = {c.experiment_name for c in cfgs}
    assert len(names) == len(cfgs), 'expanded experiment names must be unique'
