"""Fully connected BNN (reference: /root/reference/src/models/tabular/fcn.py)."""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mile_tpu.config.models import FCNConfig
from mile_tpu.models.blocks import FullyConnected


class FCN(nn.Module):
    """FCN with ``fcn`` scope — the BNN used in all UCI experiments.

    For regression the final layer has 2 outputs: predictive mean and
    log-σ (reference convention, src/training/probabilistic.py:94-99).
    """

    config: FCNConfig

    def setup(self):
        self.fcn = FullyConnected(
            hidden_sizes=tuple(self.config.hidden_structure),
            activation=self.config.activation.fn,
            use_bias=self.config.use_bias,
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.fcn(x)


class PartitionFCN(FCN):
    """FCN variant used with partition warmstart/sampling (same forward)."""
