"""Native async sample sink tests (C++ via ctypes)."""
import numpy as np
import pytest

from mile_tpu.native import NativeSampleSink, native_available
from mile_tpu.train.checkpoint import load_flat_samples


def test_native_library_builds():
    assert native_available(), 'g++ toolchain should build the sink'


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    chunks = [rng.normal(size=(3, 7, 11)).astype(np.float32)
              for _ in range(4)]
    with NativeSampleSink(tmp_path, n_chains=3, dim=11) as sink:
        start = 0
        for ch in chunks:
            sink(ch, start)
            start += ch.shape[1]
    out = load_flat_samples(tmp_path)
    expected = np.concatenate(chunks, axis=1)
    np.testing.assert_array_equal(out, expected)


def test_async_progress(tmp_path):
    rng = np.random.default_rng(1)
    sink = NativeSampleSink(tmp_path, n_chains=2, dim=64)
    for i in range(10):
        sink(rng.normal(size=(2, 100, 64)).astype(np.float32), i * 100)
    sink.close()
    out = load_flat_samples(tmp_path)
    assert out.shape == (2, 1000, 64)


def test_runtime_integration(tmp_path):
    """The sink plugs into run_mclmc's sample_sink protocol."""
    import jax
    import jax.numpy as jnp

    from mile_tpu.config.training import SamplerConfig
    from mile_tpu.train.sampling import run_mclmc

    logdensity = lambda x: -0.5 * jnp.sum(x * x)
    cfg = SamplerConfig(warmup_steps=200, n_chains=2, n_samples=200,
                        n_thinning=2, step_size_init=0.05)
    with NativeSampleSink(tmp_path, n_chains=2, dim=8) as sink:
        res = run_mclmc(
            logdensity, cfg, jax.random.PRNGKey(0),
            jax.random.normal(jax.random.PRNGKey(1), (2, 8)),
            max_chunk_bytes=8 * 4 * 2 * 16,  # force several chunks
            sample_sink=sink)
    out = load_flat_samples(tmp_path)
    np.testing.assert_array_equal(out, res.samples)
