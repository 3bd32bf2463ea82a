"""LeNet-family CNNs (reference: /root/reference/src/models/images/cnns.py).

Input is NCHW (the loaders' convention) and transposed to NHWC inside —
NHWC is the layout XLA:TPU prefers for convs.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mile_tpu.config.models import LeNetConfig, LeNettiConfig


class LeNet(nn.Module):
    """LeNet-5 shape: 2 conv (+avg-pool) and 3 dense layers."""

    config: LeNetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = self.config.activation.fn
        x = x.transpose((0, 2, 3, 1))
        x = nn.Conv(6, kernel_size=(5, 5), padding=2, name='conv1')(x)
        x = act(x)
        x = nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))
        x = nn.Conv(16, kernel_size=(5, 5), padding=0, name='conv2')(x)
        x = act(x)
        x = nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        x = act(nn.Dense(120, use_bias=self.config.use_bias, name='fc1')(x))
        x = act(nn.Dense(84, use_bias=self.config.use_bias, name='fc2')(x))
        return nn.Dense(self.config.out_dim, use_bias=self.config.use_bias,
                        name='fc3')(x)


class LeNetti(nn.Module):
    """Minimal CNN: 1 tiny conv and 4 small dense layers."""

    config: LeNettiConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = self.config.activation.fn
        x = x.transpose((0, 2, 3, 1))
        x = act(nn.Conv(1, kernel_size=(3, 3), padding=2, name='conv1')(x))
        x = x.reshape((x.shape[0], -1))
        x = act(nn.Dense(8, use_bias=self.config.use_bias, name='fc1')(x))
        x = act(nn.Dense(8, use_bias=self.config.use_bias, name='fc2')(x))
        x = act(nn.Dense(8, use_bias=self.config.use_bias, name='fc3')(x))
        return nn.Dense(self.config.out_dim, use_bias=self.config.use_bias,
                        name='fc4')(x)
