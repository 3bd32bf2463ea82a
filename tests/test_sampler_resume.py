"""Mid-chain sampler checkpoint/resume: a preempted run must continue
where it stopped (no re-warmup) and reproduce the uninterrupted run's
draws bit-for-bit."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mile_tpu.config.training import SamplerConfig
from mile_tpu.train.sampling import run_mclmc

DIM = 16
N_CHAINS = 4


def _setup():
    scale = jnp.linspace(0.5, 2.0, DIM)
    logdensity = lambda x: -0.5 * jnp.sum((x / scale) ** 2)
    cfg = SamplerConfig(warmup_steps=200, n_chains=N_CHAINS, n_samples=64,
                        n_thinning=2, step_size_init=0.05)
    positions = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                        (N_CHAINS, DIM))
    return logdensity, cfg, positions


# 32 kept draws; 4 chains x 16 dim x 4B = 256 B/kept -> 8 kept per chunk
CHUNK_BYTES = 8 * N_CHAINS * DIM * 4


class _CrashAfter:
    """Sink that kills the run after ``n`` chunks (simulated preemption)."""

    def __init__(self, n):
        self.n, self.seen = n, 0

    def __call__(self, chunk, start):
        self.seen += 1
        if self.seen >= self.n:
            raise KeyboardInterrupt('simulated preemption')


def test_resume_reproduces_uninterrupted_run(tmp_path):
    logdensity, cfg, positions = _setup()
    key = jax.random.PRNGKey(7)

    full = run_mclmc(logdensity, cfg, key, positions,
                     max_chunk_bytes=CHUNK_BYTES,
                     checkpoint_dir=tmp_path / 'full')
    assert full.samples.shape == (N_CHAINS, 32, DIM)
    # completed run cleans its checkpoint
    assert not list((tmp_path / 'full').glob('*')) \
        or not (tmp_path / 'full').exists()

    ckpt = tmp_path / 'crashy'
    with pytest.raises(KeyboardInterrupt):
        run_mclmc(logdensity, cfg, key, positions,
                  max_chunk_bytes=CHUNK_BYTES, checkpoint_dir=ckpt,
                  sample_sink=_CrashAfter(2))
    assert (ckpt / 'sampler_state.npz').exists()

    resumed = run_mclmc(logdensity, cfg, key, positions,
                        max_chunk_bytes=CHUNK_BYTES, checkpoint_dir=ckpt)
    np.testing.assert_array_equal(resumed.samples, full.samples)
    np.testing.assert_array_equal(resumed.info['energy_change'],
                                  full.info['energy_change'])
    np.testing.assert_array_equal(resumed.tuned['step_size'],
                                  full.tuned['step_size'])


def test_crash_in_first_chunk_skips_warmup(tmp_path):
    """Even before any chunk drains, the post-warmup snapshot resumes
    without re-tuning."""
    logdensity, cfg, positions = _setup()
    key = jax.random.PRNGKey(3)
    full = run_mclmc(logdensity, cfg, key, positions,
                     max_chunk_bytes=CHUNK_BYTES)

    ckpt = tmp_path / 'c'
    with pytest.raises(KeyboardInterrupt):
        run_mclmc(logdensity, cfg, key, positions,
                  max_chunk_bytes=CHUNK_BYTES, checkpoint_dir=ckpt,
                  sample_sink=_CrashAfter(1))
    resumed = run_mclmc(logdensity, cfg, key, positions,
                        max_chunk_bytes=CHUNK_BYTES, checkpoint_dir=ckpt)
    np.testing.assert_array_equal(resumed.samples, full.samples)


def test_fingerprint_mismatch_restarts(tmp_path, caplog):
    """A checkpoint from different settings must be ignored, not merged."""
    logdensity, cfg, positions = _setup()
    ckpt = tmp_path / 'fp'
    with pytest.raises(KeyboardInterrupt):
        run_mclmc(logdensity, cfg, jax.random.PRNGKey(1), positions,
                  max_chunk_bytes=CHUNK_BYTES, checkpoint_dir=ckpt,
                  sample_sink=_CrashAfter(2))
    # different rng => different fingerprint => fresh run
    out = run_mclmc(logdensity, cfg, jax.random.PRNGKey(2), positions,
                    max_chunk_bytes=CHUNK_BYTES, checkpoint_dir=ckpt)
    ref = run_mclmc(logdensity, cfg, jax.random.PRNGKey(2), positions,
                    max_chunk_bytes=CHUNK_BYTES)
    np.testing.assert_array_equal(out.samples, ref.samples)


def test_sink_offsets_on_resume(tmp_path):
    """The sink re-receives only not-yet-drained chunks, with correct
    start offsets."""
    logdensity, cfg, positions = _setup()
    key = jax.random.PRNGKey(11)
    ckpt = tmp_path / 's'
    with pytest.raises(KeyboardInterrupt):
        run_mclmc(logdensity, cfg, key, positions,
                  max_chunk_bytes=CHUNK_BYTES, checkpoint_dir=ckpt,
                  sample_sink=_CrashAfter(3))
    starts = []
    run_mclmc(logdensity, cfg, key, positions,
              max_chunk_bytes=CHUNK_BYTES, checkpoint_dir=ckpt,
              sample_sink=lambda chunk, start: starts.append(
                  (start, chunk.shape[1])))
    assert starts  # resumed run sinks the remaining chunks
    assert starts[-1][0] + starts[-1][1] == 32
    # offsets are contiguous
    for (s0, b0), (s1, _) in zip(starts, starts[1:]):
        assert s0 + b0 == s1


@pytest.mark.parametrize('sampler', ['nuts', 'hmc'])
def test_hmc_family_resume_reproduces(tmp_path, sampler):
    """NUTS/HMC runtime: resumed draws and per-draw info match the
    uninterrupted run bit-for-bit."""
    from mile_tpu.config.training import Sampler
    from mile_tpu.train.sampling_hmc import run_hmc_family

    logdensity, _, positions = _setup()
    cfg = SamplerConfig(name=Sampler(sampler), warmup_steps=150,
                        n_chains=N_CHAINS, n_samples=64, n_thinning=2,
                        num_integration_steps=8)
    key = jax.random.PRNGKey(5)

    full = run_hmc_family(logdensity, cfg, key, positions,
                          max_chunk_bytes=CHUNK_BYTES,
                          checkpoint_dir=tmp_path / 'full')
    ckpt = tmp_path / 'crashy'
    with pytest.raises(KeyboardInterrupt):
        run_hmc_family(logdensity, cfg, key, positions,
                       max_chunk_bytes=CHUNK_BYTES, checkpoint_dir=ckpt,
                       sample_sink=_CrashAfter(2))
    resumed = run_hmc_family(logdensity, cfg, key, positions,
                             max_chunk_bytes=CHUNK_BYTES,
                             checkpoint_dir=ckpt)
    np.testing.assert_array_equal(resumed.samples, full.samples)
    np.testing.assert_array_equal(resumed.info['acceptance_rate'],
                                  full.info['acceptance_rate'])


def test_keep_warmup_trace_survives_resume(tmp_path):
    """VERDICT r1 weak item 7: a resumed run's artifacts must include the
    warmup trace, identical to the uninterrupted run's."""
    import dataclasses

    logdensity, cfg, positions = _setup()
    cfg = dataclasses.replace(cfg, keep_warmup=True)
    key = jax.random.PRNGKey(7)

    full = run_mclmc(logdensity, cfg, key, positions,
                     max_chunk_bytes=CHUNK_BYTES)
    assert 'warmup_trace' in full.info

    ckpt = tmp_path / 'crashy'
    with pytest.raises(KeyboardInterrupt):
        run_mclmc(logdensity, cfg, key, positions,
                  max_chunk_bytes=CHUNK_BYTES, checkpoint_dir=ckpt,
                  sample_sink=_CrashAfter(2))
    assert (ckpt / 'warmup_trace.npy').exists()

    resumed = run_mclmc(logdensity, cfg, key, positions,
                        max_chunk_bytes=CHUNK_BYTES, checkpoint_dir=ckpt)
    np.testing.assert_array_equal(resumed.info['warmup_trace'],
                                  full.info['warmup_trace'])
    np.testing.assert_array_equal(resumed.samples, full.samples)
    assert not (ckpt / 'warmup_trace.npy').exists()  # cleared on success
