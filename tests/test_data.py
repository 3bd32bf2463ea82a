"""Tabular loader tests on the bundled UCI data."""
import jax
import jax.numpy as jnp
import pytest

from mile_tpu.config.data import DataConfig, Task
from mile_tpu.data import TabularLoader, build_loader


@pytest.fixture
def cfg():
    return DataConfig(
        path='data/airfoil.data',
        task=Task.REGRESSION,
        train_split=0.7,
        valid_split=0.1,
        test_split=0.2,
    )


@pytest.fixture
def loader(cfg):
    return TabularLoader(cfg, 0)


def test_splits_and_shapes(loader):
    x, y = loader.arrays('train')
    assert x.shape[1] == 5  # airfoil: 5 features + 1 target
    assert x.shape[0] == y.shape[0]
    total = sum(loader.arrays(s)[0].shape[0] for s in ('train', 'valid', 'test'))
    assert total == len(loader) == 1503


def test_normalization(loader):
    x, _ = loader.arrays('train')
    # z-normalized over the full dataset => train stats close to 0/1
    assert jnp.all(jnp.abs(x.mean(axis=0)) < 0.15)
    assert jnp.all(jnp.abs(x.std(axis=0) - 1.0) < 0.2)


def test_minibatch_iter(loader):
    batches = list(loader.iter('train', batch_size=32))
    assert all(b['feature'].shape == (32, 5) for b in batches)
    assert len(batches) == loader.arrays('train')[0].shape[0] // 32


def test_full_batch_iter(loader):
    (batch,) = list(loader.iter('test'))
    assert batch['feature'].shape[0] == loader.arrays('test')[0].shape[0]


def test_shuffle_preserves_set(loader):
    x0, y0 = loader.arrays('train')
    loader.shuffle('train')
    x1, y1 = loader.arrays('train')
    assert not jnp.allclose(x0, x1)  # order changed
    assert jnp.allclose(jnp.sort(y0), jnp.sort(y1))  # same multiset


def test_classification_labels_int():
    cfg = DataConfig(
        path='data/sonar_proc.data',
        task=Task.CLASSIFICATION,
        train_split=0.8,
        valid_split=0.1,
        test_split=0.1,
    )
    loader = build_loader(cfg, 0)
    _, y = loader.arrays('train')
    assert y.dtype == jnp.int32
    assert set(jax.device_get(y).tolist()) <= {0, 1}


def test_datapoint_limit(cfg):
    limited = TabularLoader(
        cfg.replace(datapoint_limit=100), 0
    )
    assert len(limited) == 100


def test_deterministic_given_seed(cfg):
    l1 = TabularLoader(cfg, 3)
    l2 = TabularLoader(cfg, 3)
    assert jnp.allclose(l1.arrays('train')[0], l2.arrays('train')[0])
