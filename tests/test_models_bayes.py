"""Model zoo + Bayesian layer tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mile_tpu.bayes import BayesianModel, Prior
from mile_tpu.config import (
    AttentionClassifierConfig,
    FCNConfig,
    LeNetConfig,
    LeNettiConfig,
    PriorDist,
    Task,
)
from mile_tpu.models import build_model


def test_fcn_forward_shapes():
    cfg = FCNConfig(hidden_structure=[16, 16, 2])
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((4, 5)))['params']
    out = model.apply({'params': params}, jnp.ones((7, 5)))
    assert out.shape == (7, 2)
    # layer naming contract: fcn scope with layer{i}
    assert set(params['fcn'].keys()) == {'layer0', 'layer1', 'layer2'}


def test_lenet_forward():
    for cfg, name in [(LeNetConfig(out_dim=10), 'LeNet'),
                      (LeNettiConfig(out_dim=10), 'LeNetti')]:
        model = build_model(cfg)
        x = jnp.ones((2, 1, 28, 28))  # NCHW
        params = model.init(jax.random.PRNGKey(0), x)['params']
        assert model.apply({'params': params}, x).shape == (2, 10)


def test_attention_classifier_forward():
    cfg = AttentionClassifierConfig(
        vocab_size=50, context_len=12, emb_size=16, n_heads=2, qkv_dim=16,
        n_classes=3, projection_dim=[8],
    )
    model = build_model(cfg)
    x = jnp.ones((3, 12), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x)['params']
    assert model.apply({'params': params}, x).shape == (3, 3)


def test_pad_mask_ignores_padding():
    cfg = AttentionClassifierConfig(
        vocab_size=50, context_len=8, emb_size=16, n_heads=2, qkv_dim=16,
        n_classes=2, projection_dim=[8],
    )
    model = build_model(cfg)
    a = jnp.array([[5, 6, 7, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), a)['params']
    # changing a non-pad token changes logits; output is finite
    b = a.at[0, 1].set(9)
    out_a = model.apply({'params': params}, a)
    out_b = model.apply({'params': params}, b)
    assert jnp.all(jnp.isfinite(out_a))
    assert not jnp.allclose(out_a, out_b)


# ------------------------------------------------------------------ priors
def test_normal_prior_matches_scipy():
    from scipy.stats import norm

    prior = Prior.from_name(PriorDist.NORMAL, loc=0.5, scale=2.0)
    theta = jnp.asarray(np.random.default_rng(0).normal(size=101), jnp.float32)
    expected = norm.logpdf(np.asarray(theta), loc=0.5, scale=2.0).sum()
    assert np.isclose(float(prior.log_prior(theta)), expected, rtol=1e-5)


def test_laplace_prior_matches_scipy():
    from scipy.stats import laplace

    prior = Prior.from_name(PriorDist.LAPLACE, loc=0.0, scale=1.5)
    theta = jnp.asarray(np.random.default_rng(1).normal(size=57), jnp.float32)
    expected = laplace.logpdf(np.asarray(theta), loc=0.0, scale=1.5).sum()
    assert np.isclose(float(prior.log_prior(theta)), expected, rtol=1e-5)


# --------------------------------------------------------------- posterior
@pytest.fixture
def bayes_regr():
    cfg = FCNConfig(hidden_structure=[8, 2])
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 3)))['params']
    prior = Prior.from_name(PriorDist.STANDARD_NORMAL)
    return BayesianModel(model, params, prior, Task.REGRESSION), params


def test_flat_matches_pytree(bayes_regr):
    bm, params = bayes_regr
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
    y = jax.random.normal(jax.random.PRNGKey(2), (10,))
    theta = bm.flatten(params)
    assert jnp.allclose(
        bm.log_posterior(theta, x, y),
        bm.log_unnormalized_posterior(params, x, y),
    )


def test_gaussian_loglik_value(bayes_regr):
    from scipy.stats import norm

    bm, params = bayes_regr
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
    y = jax.random.normal(jax.random.PRNGKey(2), (10,))
    lvals = bm.module.apply({'params': params}, x)
    expected = norm.logpdf(
        np.asarray(y), loc=np.asarray(lvals[:, 0]),
        scale=np.exp(np.asarray(lvals[:, 1])),
    ).sum()
    got = float(bm.log_likelihood(bm.flatten(params), x, y))
    assert np.isclose(got, expected, rtol=1e-4)


def test_classification_posterior_finite_and_grad():
    cfg = FCNConfig(hidden_structure=[8, 3])
    model = build_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (20, 4))
    y = jnp.asarray(np.random.default_rng(0).integers(0, 3, 20), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x)['params']
    bm = BayesianModel(model, params, Prior.from_name(PriorDist.STANDARD_NORMAL),
                       Task.CLASSIFICATION)
    logdensity = bm.logdensity_fn(x, y)
    theta = bm.flatten(params)
    val, grad = jax.value_and_grad(logdensity)(theta)
    assert jnp.isfinite(val)
    assert grad.shape == theta.shape
    assert jnp.all(jnp.isfinite(grad))


def test_chunked_likelihood_matches_full():
    """Chunked+remat likelihood must equal full-batch value AND gradient."""
    from mile_tpu.config.data import DataConfig  # noqa: F401  (parity import)

    cfg = FCNConfig(hidden_structure=[8, 2])
    model = build_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (53, 3))  # odd remainder
    y = jax.random.normal(jax.random.PRNGKey(2), (53,))
    params = model.init(jax.random.PRNGKey(0), x[:1])['params']
    prior = Prior.from_name(PriorDist.STANDARD_NORMAL)
    full = BayesianModel(model, params, prior, Task.REGRESSION)
    chunked = BayesianModel(model, params, prior, Task.REGRESSION,
                            likelihood_chunk_size=16)
    theta = full.flatten(params)
    v1, g1 = jax.value_and_grad(full.logdensity_fn(x, y))(theta)
    v2, g2 = jax.value_and_grad(chunked.logdensity_fn(x, y))(theta)
    assert np.isclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_bf16_compute_dtype_fp32_energy():
    """compute_dtype='bfloat16': forward runs in bf16, but the density and
    gradient come back float32 and stay within mixed-precision tolerance
    of the f32 path (SURVEY §7.4 numerics: bf16 compute, fp32 energy)."""
    cfg = FCNConfig(hidden_structure=[8, 2])
    model = build_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 5))
    y = jax.random.normal(jax.random.PRNGKey(2), (64,))
    params = model.init(jax.random.PRNGKey(0), x[:1])['params']
    prior = Prior.from_name(PriorDist.STANDARD_NORMAL)
    f32 = BayesianModel(model, params, prior, Task.REGRESSION)
    bf16 = BayesianModel(model, params, prior, Task.REGRESSION,
                         compute_dtype='bfloat16')
    chunked = BayesianModel(model, params, prior, Task.REGRESSION,
                            compute_dtype='bfloat16',
                            likelihood_chunk_size=16)
    theta = f32.flatten(params)
    v1, g1 = jax.value_and_grad(f32.logdensity_fn(x, y))(theta)
    v2, g2 = jax.value_and_grad(bf16.logdensity_fn(x, y))(theta)
    v3, _ = jax.value_and_grad(chunked.logdensity_fn(x, y))(theta)
    assert v2.dtype == jnp.float32 and g2.dtype == jnp.float32
    assert abs(float(v2) - float(v1)) / abs(float(v1)) < 0.05
    assert abs(float(v3) - float(v2)) / max(abs(float(v2)), 1.0) < 0.02
    cos = float(jnp.dot(g1, g2)
                / (jnp.linalg.norm(g1) * jnp.linalg.norm(g2)))
    assert cos > 0.999
