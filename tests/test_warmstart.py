"""Deep-ensemble warmstart training tests."""
import jax
import jax.numpy as jnp
import numpy as np

from mile_tpu.config.data import DataConfig, Task
from mile_tpu.config.models import FCNConfig
from mile_tpu.config.training import OptimizerConfig, WarmstartConfig
from mile_tpu.data import TabularLoader
from mile_tpu.models import build_model
from mile_tpu.parallel.mesh import chain_mesh
from mile_tpu.train.warmstart import earlystop_mask, train_ensemble


def _setup():
    data_cfg = DataConfig(path='data/airfoil.data', task=Task.REGRESSION,
                          train_split=0.7, valid_split=0.1, test_split=0.2)
    loader = TabularLoader(data_cfg, 0)
    model = build_model(FCNConfig(hidden_structure=[16, 16, 2]))
    return loader, model


def test_ensemble_trains_and_improves():
    loader, model = _setup()
    cfg = WarmstartConfig(
        optimizer_config=OptimizerConfig(
            parameters={'learning_rate': 0.01, 'weight_decay': 0.001}),
        max_epochs=25, batch_size=64, patience=None)
    params, store = train_ensemble(
        model, loader, cfg, Task.REGRESSION, n_members=4,
        rng=jax.random.PRNGKey(1))
    # member axis everywhere
    assert jax.tree.leaves(params)[0].shape[0] == 4
    nlll = np.asarray(store.train.nlll)  # (4, n_epochs)
    assert nlll.shape[0] == 4
    assert np.all(nlll[:, -1] < nlll[:, 0])  # training improved
    assert np.isfinite(np.asarray(store.test.rmse)).all()
    # members differ (independent inits)
    leaf = jax.tree.leaves(params)[0]
    assert not jnp.allclose(leaf[0], leaf[1])


def test_ensemble_on_mesh():
    loader, model = _setup()
    mesh = chain_mesh()  # 8 virtual devices
    cfg = WarmstartConfig(max_epochs=3, batch_size=128, patience=None)
    params, _ = train_ensemble(
        model, loader, cfg, Task.REGRESSION, n_members=8,
        rng=jax.random.PRNGKey(1), mesh=mesh)
    leaf = jax.tree.leaves(params)[0]
    assert leaf.shape[0] == 8
    assert np.isfinite(np.asarray(leaf)).all()


def test_early_stopping_stops_all():
    loader, model = _setup()
    cfg = WarmstartConfig(max_epochs=200, batch_size=256, patience=2)
    params, store = train_ensemble(
        model, loader, cfg, Task.REGRESSION, n_members=2,
        rng=jax.random.PRNGKey(2))
    # with patience=2 the run must terminate well before 200 epochs
    assert store.valid.shape[-1] < 200


def test_earlystop_mask_logic():
    losses = np.array([
        [3.0, 2.0, 1.0, 1.1, 1.2, 1.3],   # rising after epoch 2
        [3.0, 2.5, 2.0, 1.5, 1.0, 0.5],   # still improving
    ])
    mask = earlystop_mask(losses, patience=3)
    assert mask.tolist() == [True, False]
    assert earlystop_mask(losses[:, :2], patience=3).tolist() == [False, False]


def test_classification_training():
    data_cfg = DataConfig(path='data/sonar_proc.data', task=Task.CLASSIFICATION,
                          train_split=0.8, valid_split=0.1, test_split=0.1)
    loader = TabularLoader(data_cfg, 0)
    model = build_model(FCNConfig(hidden_structure=[16, 2]))
    cfg = WarmstartConfig(max_epochs=20, batch_size=32, patience=None)
    params, store = train_ensemble(
        model, loader, cfg, Task.CLASSIFICATION, n_members=2,
        rng=jax.random.PRNGKey(1))
    acc = np.asarray(store.train.accuracy)
    assert acc[:, -1].mean() > 0.6  # sonar train accuracy after 20 epochs
