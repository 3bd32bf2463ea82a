"""Smoke test for the symmetric-split HMC baseline script
(experiments/symmetric_splitting.py) on a synthetic local image npz."""
import sys
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture()
def image_npz(tmp_path):
    rng = np.random.default_rng(0)
    n, c, h, w = 256, 1, 14, 14
    y = rng.integers(0, 10, size=n)
    # 0-255 pixel range (the loader normalizes /255); class-dependent
    # mean so the posterior is informative
    x = (rng.normal(size=(n, c, h, w)) * 20.0 + 100.0
         + 10.0 * y[:, None, None, None]).astype(np.float32)
    path = tmp_path / 'synth_images.npz'
    np.savez(path, x=x, y=y)
    return path


def test_script_end_to_end(image_npz, capsys):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / 'experiments'))
    try:
        import symmetric_splitting
    finally:
        sys.path.pop(0)

    result = symmetric_splitting.main([
        '--dataset', str(image_npz), '--source', 'local',
        '--batch-size', '32', '--num-samples', '6', '--burn', '2',
        '--num-steps', '3', '--step-size', '1e-4',
    ])
    assert 0.0 <= result['accuracy'] <= 1.0
    assert np.isfinite(result['lppd'])
    assert result['n_samples'] == 4
    assert 0.0 <= result['acceptance_rate'] <= 1.0
    out = capsys.readouterr().out
    assert 'Accuracy:' in out and 'LPPD:' in out
