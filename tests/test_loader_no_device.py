"""Loader construction must perform ZERO device dispatches.

Round 4's driver benchmark died at data loading because the loader seed
path did a device round-trip on a wedged TPU (VERDICT r4 weak 1 /
BENCH_r04.json rc=1). These tests pin the contract: building a loader —
including its seeded shuffle, normalization, and splits — is pure host
numpy; arrays reach the device only at the ``arrays()``/``iter()``
boundary.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mile_tpu.config.data import DataConfig, DatasetType, Task


def _tab_cfg():
    return DataConfig(path='data/airfoil.data', data_type=DatasetType.TABULAR,
                      task=Task.REGRESSION, target_len=1, normalize=True,
                      train_split=0.7, valid_split=0.1, test_split=0.2)


def test_tabular_loader_no_device_dispatch():
    from mile_tpu.data import TabularLoader

    # transfer_guard('disallow') turns ANY host<->device transfer into an
    # error — loader construction and host-side epoch prep must survive it
    with jax.transfer_guard('disallow'):
        loader = TabularLoader(_tab_cfg(), 0)
        loader.shuffle('train')
        assert loader.n_features > 0
        assert len(loader) > 0
    # the device boundary is arrays(): works outside the guard
    x, y = loader.arrays('train')
    assert x.shape[0] == y.shape[0]


def test_experiment_keys_loader_is_host_side():
    from mile_tpu.utils.keys import experiment_keys

    with jax.transfer_guard('disallow'):
        keys = experiment_keys(4)
        seed = keys.loader
        assert isinstance(seed, np.random.SeedSequence)
    # deterministic: same rng -> same loader stream
    a = np.random.default_rng(experiment_keys(4).loader).permutation(10)
    b = np.random.default_rng(experiment_keys(4).loader).permutation(10)
    assert (a == b).all()
    c = np.random.default_rng(experiment_keys(5).loader).permutation(10)
    assert not (a == c).all()


def test_experiment_keys_device_keys_unchanged():
    """init/train/sample keep their round-1..4 derivation (split slots
    1-3) so recorded warmstart/sampling streams stay reproducible."""
    from mile_tpu.utils.keys import experiment_keys

    keys = experiment_keys(7)
    legacy = jax.random.split(jax.random.PRNGKey(7), 4)
    assert (jax.random.key_data(keys.init)
            == jax.random.key_data(legacy[1])).all()
    assert (jax.random.key_data(keys.train)
            == jax.random.key_data(legacy[2])).all()
    assert (jax.random.key_data(keys.sample)
            == jax.random.key_data(legacy[3])).all()


def test_np_rng_rejects_device_keys():
    from mile_tpu.data.tabular import _np_rng

    with pytest.raises(TypeError, match='host-side'):
        _np_rng(jax.random.PRNGKey(0))


def test_image_text_loader_no_device_dispatch(tmp_path):
    from mile_tpu.data.image import ImageLoader
    from mile_tpu.data.text import TextLoader

    rs = np.random.RandomState(0)
    npz = tmp_path / 'img.npz'
    np.savez(npz, x=rs.rand(32, 8, 8).astype(np.float32) * 255,
             y=rs.randint(0, 3, 32))
    csv = tmp_path / 'text.csv'
    with open(csv, 'w') as f:
        f.write('text,label\n')
        for i in range(24):
            f.write(f'abcd efgh x{i % 7},{"pos" if i % 2 else "neg"}\n')

    with jax.transfer_guard('disallow'):
        img = ImageLoader(
            DataConfig(path=str(npz), data_type=DatasetType.IMAGE,
                       task=Task.CLASSIFICATION), 0)
        txt = TextLoader(
            DataConfig(path=str(csv), source='local',
                       data_type=DatasetType.TEXT,
                       task=Task.CLASSIFICATION), 0, context_len=16)
        assert len(img) and len(txt)
    xi, yi = img.arrays('train')
    xt, yt = txt.arrays('train')
    assert xi.shape[0] == yi.shape[0] and xt.shape[0] == yt.shape[0]
