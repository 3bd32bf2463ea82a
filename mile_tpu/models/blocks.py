"""NN building blocks.

Reference: /root/reference/src/flax_building_blocks/basic.py:9-144.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn


class FullyConnected(nn.Module):
    """Stack of Dense layers named ``layer{i}`` with activation between.

    Layer naming matches the reference so checkpoints / partition logic can
    address first/last layers by key order.
    """

    hidden_sizes: tuple[int, ...]
    activation: Callable
    use_bias: bool = True
    last_layer_activation: Optional[Callable] = None
    blockid: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        prefix = f'{self.blockid}_' if self.blockid else ''
        n = len(self.hidden_sizes)
        for i, size in enumerate(self.hidden_sizes):
            x = nn.Dense(
                features=size,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name=f'{prefix}layer{i}',
            )(x)
            if i < n - 1:
                x = self.activation(x)
            elif self.last_layer_activation is not None:
                x = self.last_layer_activation(x)
        return x


class MaskedMultiHeadSelfAttention(nn.Module):
    """Causal multi-head self-attention block."""

    n_heads: int
    qkv_dim: int
    bias: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = False) -> jnp.ndarray:
        mask = nn.make_causal_mask(x[:, :, 0], dtype=jnp.bool_)
        return nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.qkv_dim,
            use_bias=self.bias,
            dtype=self.dtype,
            deterministic=deterministic,
            out_features=x.shape[-1],
        )(x, mask=mask)


class TokenEmbedding(nn.Module):
    """Token embedding with optional learned positional encoding."""

    vocab_size: int
    emb_size: int
    dtype: jnp.dtype
    pos_size: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        embed = nn.Embed(
            num_embeddings=self.vocab_size,
            features=self.emb_size,
            dtype=self.dtype,
            name='Embedding',
        )(x)
        if self.pos_size:
            pos = jnp.arange(x.shape[1])[None, :]
            embed = embed + nn.Embed(
                num_embeddings=self.pos_size,
                features=self.emb_size,
                dtype=self.dtype,
                name='PositionEmbedding',
            )(pos)
        return embed


class PretrainedTokenEmbedding(nn.Module):
    """Frozen embedding lookup from ``.npy`` weights (not trained/sampled)."""

    pretrained_weights_path: str
    pos_size: Optional[int] = None

    def setup(self):
        import os

        import numpy as np

        self._emb = jnp.asarray(np.load(self.pretrained_weights_path))
        if self.pos_size:
            # reference convention: sibling file named 'emb' -> 'pos_emb'
            # (/root/reference/src/flax_building_blocks/basic.py:131); we
            # apply it to the basename only so directories containing
            # 'emb' don't corrupt the path
            head, base = os.path.split(self.pretrained_weights_path)
            pos_path = os.path.join(head, base.replace('emb', 'pos_emb', 1))
            self._pos = jnp.asarray(np.load(pos_path))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        embed = jnp.take(self._emb, x, axis=0)
        if self.pos_size:
            embed = embed + jnp.take(self._pos, jnp.arange(x.shape[1])[None, :], axis=0)
        return embed
