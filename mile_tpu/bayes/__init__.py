"""Probabilistic layer: priors + posterior densities."""
from mile_tpu.bayes.posterior import (  # noqa: F401
    BayesianModel,
    categorical_loglik,
    gaussian_loglik,
)
from mile_tpu.bayes.priors import Prior  # noqa: F401
