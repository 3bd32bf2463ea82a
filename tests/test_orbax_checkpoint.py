"""Orbax ensemble checkpoint round-trip (incl. sharded restore)."""
import jax
import jax.numpy as jnp
import numpy as np

from mile_tpu.parallel.mesh import chain_mesh, shard_chains
from mile_tpu.train.checkpoint_orbax import load_ensemble, save_ensemble


def _params(n_members=8):
    keys = jax.random.split(jax.random.PRNGKey(0), n_members)
    return {
        'layer0': {'kernel': jax.vmap(
            lambda k: jax.random.normal(k, (5, 16)))(keys),
            'bias': jnp.zeros((n_members, 16))},
        'layer1': {'kernel': jnp.ones((n_members, 16, 2))},
    }


def test_roundtrip(tmp_path):
    params = _params()
    save_ensemble(tmp_path / 'ckpt', params, step=3)
    restored = load_ensemble(tmp_path / 'ckpt')
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_step_selected(tmp_path):
    params = _params()
    save_ensemble(tmp_path / 'ckpt', params, step=1)
    bumped = jax.tree.map(lambda x: x + 1.0, params)
    save_ensemble(tmp_path / 'ckpt', bumped, step=2)
    restored = load_ensemble(tmp_path / 'ckpt')
    np.testing.assert_array_equal(
        np.asarray(restored['layer1']['kernel']),
        np.asarray(bumped['layer1']['kernel']))


def test_sharded_restore(tmp_path):
    mesh = chain_mesh()
    params = shard_chains(_params(8), mesh)
    save_ensemble(tmp_path / 'ckpt', params, step=0)
    restored = load_ensemble(tmp_path / 'ckpt', template=params)
    leaf = restored['layer0']['kernel']
    assert len(leaf.sharding.device_set) == 8  # restored onto the mesh
    np.testing.assert_array_equal(
        np.asarray(leaf), np.asarray(params['layer0']['kernel']))
