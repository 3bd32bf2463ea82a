"""Memory-capped evaluation batching (VERDICT r1 item 3).

The reference caps prediction batch size from a 4 GB host-side heuristic
(/root/reference/src/inference/inference.ipynb cell 21) and batches over
observations (/root/reference/src/inference/evaluation.py:334-406). Here
the budget drives BOTH the sample and the observation chunk, planned from
an abstract trace of the model's activations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mile_tpu.config import LeNetConfig, Task
from mile_tpu.config.models import FCNConfig
from mile_tpu.inference.evaluation import (
    evaluate_bde,
    plan_eval_chunks,
    predict_from_flat,
    unit_activation_bytes,
)
from mile_tpu.models import build_model


def _flat_model(cfg, x):
    from jax.flatten_util import ravel_pytree

    module = build_model(cfg)
    params = module.init(jax.random.PRNGKey(0), x[:1])['params']
    flat, unravel = ravel_pytree(params)
    return module, unravel, flat


def test_unit_bytes_positive_and_scales_with_model():
    x_tab = jnp.zeros((8, 5))
    m_small, u_small, f_small = _flat_model(
        FCNConfig(hidden_structure=[4, 2]), x_tab)
    small = unit_activation_bytes(m_small, u_small, f_small.size, x_tab)

    x_img = jnp.zeros((4, 1, 28, 28))
    m_lenet, u_lenet, f_lenet = _flat_model(
        LeNetConfig(out_dim=10), x_img)
    big = unit_activation_bytes(m_lenet, u_lenet, f_lenet.size, x_img)

    assert small > 0
    # LeNet's conv feature maps dwarf a tiny FCN's activations
    assert big > 50 * small


def test_plan_shrinks_obs_axis_first():
    x = jnp.zeros((10_000, 1, 28, 28))
    module, unravel, flat = _flat_model(LeNetConfig(out_dim=10), x)
    unit = unit_activation_bytes(module, unravel, flat.size, x)

    # generous budget: everything fits
    s, o = plan_eval_chunks(module, unravel, flat.size, x, n_samples=128,
                            sample_batch=128,
                            memory_budget_bytes=10 ** 15)
    assert (s, o) == (128, 10_000)

    # 4 GiB budget on the VERDICT scenario (62k params, 10k test images,
    # 128 samples): obs axis must shrink, sample axis must stay wide
    s, o = plan_eval_chunks(module, unravel, flat.size, x, n_samples=128,
                            sample_batch=128,
                            memory_budget_bytes=4 * 1024 ** 3)
    assert s == 128
    assert 1 <= o < 10_000
    assert 128 * o * unit <= 4 * 1024 ** 3

    # pathological budget: even one observation doesn't fit at full width
    s, o = plan_eval_chunks(module, unravel, flat.size, x, n_samples=128,
                            sample_batch=128,
                            memory_budget_bytes=max(1, 4 * unit))
    assert o == 1 and 1 <= s <= 4


def test_chunked_predictions_match_unchunked():
    x = jnp.asarray(np.random.RandomState(0).randn(37, 5).astype(np.float32))
    module, unravel, flat = _flat_model(FCNConfig(hidden_structure=[8, 4, 2]),
                                        x)
    thetas = jnp.asarray(
        np.random.RandomState(1).randn(11, flat.size).astype(np.float32))

    full = predict_from_flat(module, unravel, thetas, x, sample_batch=11,
                             memory_budget_bytes=10 ** 15)
    unit = unit_activation_bytes(module, unravel, flat.size, x)
    # force sample chunks of ~3 and obs chunks of ~7
    chunked = predict_from_flat(module, unravel, thetas, x, sample_batch=3,
                                memory_budget_bytes=3 * 7 * unit)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_lenet_scale_eval_within_budget():
    """LeNet-sized eval (62k params, 10k obs, 128 samples) completes with a
    4 GiB activation budget — the exact OOM scenario from VERDICT r1."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(10_000, 1, 28, 28).astype(np.float32))
    y = jnp.asarray(rs.randint(0, 10, size=(10_000,)))
    module, unravel, flat = _flat_model(LeNetConfig(out_dim=10), x)
    assert flat.size > 60_000
    # 12 chains as in the reference configs; keep total samples at 132 to
    # bound CPU time while still exceeding the >=128-sample criterion
    samples = jnp.asarray(
        0.05 * rs.randn(12, 11, flat.size).astype(np.float32))
    preds, metrics = evaluate_bde(
        module, unravel, samples, x, y, Task.CLASSIFICATION,
        memory_budget_bytes=4 * 1024 ** 3, verbose=False)
    assert preds.shape == (12, 11, 10_000, 10)
    assert np.isfinite(metrics['lppd'])
