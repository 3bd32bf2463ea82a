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


def test_orbax_resume_reproduces_npz_resume(tmp_path):
    """VERDICT r1 item 9: checkpoint_format='orbax' routes the sampler
    state snapshot through orbax and resumes bit-identically."""
    from mile_tpu.config.training import SamplerConfig
    from mile_tpu.train.sampling import run_mclmc

    dim, n_chains = 8, 4
    logdensity = lambda x: -0.5 * jnp.sum(x * x)
    cfg = SamplerConfig(warmup_steps=150, n_chains=n_chains, n_samples=32,
                        n_thinning=2, step_size_init=0.05)
    positions = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                        (n_chains, dim))
    key = jax.random.PRNGKey(7)
    chunk_bytes = 4 * n_chains * dim * 4  # 4 kept draws per chunk

    full = run_mclmc(logdensity, cfg, key, positions,
                     max_chunk_bytes=chunk_bytes)

    class _Crash:
        seen = 0

        def __call__(self, chunk, start):
            _Crash.seen += 1
            if _Crash.seen >= 2:
                raise KeyboardInterrupt('simulated preemption')

    try:
        run_mclmc(logdensity, cfg, key, positions,
                  max_chunk_bytes=chunk_bytes,
                  checkpoint_dir=tmp_path / 'ck', checkpoint_format='orbax',
                  sample_sink=_Crash())
    except KeyboardInterrupt:
        pass
    assert (tmp_path / 'ck' / 'sampler_state_orbax').exists()

    resumed = run_mclmc(logdensity, cfg, key, positions,
                        max_chunk_bytes=chunk_bytes,
                        checkpoint_dir=tmp_path / 'ck',
                        checkpoint_format='orbax')
    np.testing.assert_array_equal(resumed.samples, full.samples)
    assert not (tmp_path / 'ck' / 'sampler_state_orbax').exists()  # cleared


def test_trainer_orbax_format_roundtrip(tmp_path):
    """checkpoint_format: orbax writes the warmstart ensemble via orbax
    and a second experiment reuses it through warmstart_exp_dir."""
    import yaml

    from mile_tpu.config import Config
    from mile_tpu.train.trainer import BDETrainer

    rng = np.random.default_rng(0)
    xs = rng.normal(size=(200, 4)).astype(np.float32)
    ys = (xs @ np.array([1.0, -1.0, 0.5, 0.0])).astype(np.float32)
    np.save(tmp_path / 'xs.npy', np.c_[xs, ys])

    base = f"""
saving_dir: '{tmp_path}/res'
experiment_name: 'orb'
data:
  path: '{tmp_path}/xs.npy'
  data_type: 'tabular'
  task: 'regr'
  train_split: 0.7
  valid_split: 0.15
  test_split: 0.15
model: {{model: FCN, hidden_structure: [4, 2]}}
training:
  checkpoint_format: orbax
  warmstart:
    include: true
    optimizer_config: {{name: adam, parameters: {{learning_rate: 0.01}}}}
    max_epochs: 5
    batch_size: 32
  sampler:
    name: mclmc
    warmup_steps: 200
    n_chains: 2
    n_samples: 100
    n_thinning: 2
    step_size_init: 0.01
rng: 0
logging: false
"""
    cfg = Config.from_dict(yaml.safe_load(base))
    metrics = BDETrainer(cfg).train(report=False)
    assert np.isfinite(metrics['lppd'])
    exp_dir = tmp_path / 'res' / 'orb'
    assert (exp_dir / 'warmstart' / 'orbax').exists()

    reuse = yaml.safe_load(base)
    reuse['experiment_name'] = 'orb_reuse'
    reuse['training']['warmstart']['warmstart_exp_dir'] = str(exp_dir)
    # remove the npz per-chain files so the reuse MUST go through orbax
    removed = list((exp_dir / 'warmstart').glob('params_*.npz'))
    assert removed, 'expected per-chain npz files to exist'
    for p in removed:
        p.unlink()
    cfg2 = Config.from_dict(reuse)
    metrics2 = BDETrainer(cfg2).train(report=False)
    assert np.isfinite(metrics2['lppd'])
    # same warmstart + same keys -> identical sampling results
    assert metrics2['lppd'] == metrics['lppd']


def test_sharded_restore(tmp_path):
    mesh = chain_mesh()
    params = shard_chains(_params(8), mesh)
    save_ensemble(tmp_path / 'ckpt', params, step=0)
    restored = load_ensemble(tmp_path / 'ckpt', template=params)
    leaf = restored['layer0']['kernel']
    assert len(leaf.sharding.device_set) == 8  # restored onto the mesh
    np.testing.assert_array_equal(
        np.asarray(leaf), np.asarray(params['layer0']['kernel']))
