"""Attention-based text classifiers.

Reference: /root/reference/src/models/text/attention_classifier.py:17-176.
One MHA block over (pad-masked) token embeddings, mean-pool, MLP head.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mile_tpu.config.models import (
    AttentionClassifierConfig,
    EmbeddingClassifierConfig,
    PretrainedAttentionClassifierConfig,
)
from mile_tpu.models.blocks import PretrainedTokenEmbedding, TokenEmbedding


def _pad_mask(tokens: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    """(B, T) tokens -> (B, 1, T, T) attention mask excluding pad positions."""
    valid = tokens != pad_id
    return (valid[:, :, None] & valid[:, None, :])[:, None, :, :]


class _AttentionHead(nn.Module):
    """Shared MHA + mean-pool + projection + classifier tail."""

    config: AttentionClassifierConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dtype = cfg.dtype.dtype
        out = nn.MultiHeadDotProductAttention(
            num_heads=cfg.n_heads,
            qkv_features=cfg.qkv_dim,
            out_features=cfg.emb_size,
            dtype=dtype,
            use_bias=cfg.bias,
            name='MDPA',
        )(x, mask=mask)
        out = jnp.mean(out, axis=1)
        for i, dim in enumerate(cfg.projection_dim):
            out = nn.gelu(
                nn.Dense(dim, dtype=dtype, use_bias=cfg.bias,
                         name=f'projection_{i}')(out)
            )
        return nn.Dense(cfg.n_classes, dtype=dtype, use_bias=cfg.bias,
                        name='classifier')(out)


class AttentionClassifier(nn.Module):
    config: AttentionClassifierConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_id: int = 0,
                 train: bool = True) -> jnp.ndarray:
        cfg = self.config
        assert x.shape[1] == cfg.context_len, 'context length mismatch'
        mask = _pad_mask(x, pad_id)
        emb = TokenEmbedding(
            vocab_size=cfg.vocab_size,
            emb_size=cfg.emb_size,
            dtype=cfg.dtype.dtype,
            pos_size=cfg.context_len,
        )(x)
        return _AttentionHead(cfg)(emb, mask)


class PretrainedAttentionClassifier(nn.Module):
    config: PretrainedAttentionClassifierConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_id: int = 0,
                 train: bool = True) -> jnp.ndarray:
        cfg = self.config
        assert x.shape[1] == cfg.context_len, 'context length mismatch'
        mask = _pad_mask(x, pad_id)
        emb = PretrainedTokenEmbedding(
            pretrained_weights_path=cfg.emb_path,
            pos_size=cfg.context_len,
        )(x)
        return _AttentionHead(cfg)(emb, mask)


class EmbeddingClassifier(nn.Module):
    """Attention over precomputed embeddings (no embedding table)."""

    config: EmbeddingClassifierConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dtype = cfg.dtype.dtype
        out = nn.MultiHeadDotProductAttention(
            num_heads=cfg.n_heads,
            qkv_features=cfg.qkv_dim,
            out_features=cfg.emb_size,
            dtype=dtype,
            use_bias=cfg.bias,
            name='MDPA',
        )(x, mask=attn_mask)
        out = jnp.mean(out, axis=1)
        out = nn.gelu(
            nn.Dense(2 * cfg.emb_size, dtype=dtype, use_bias=cfg.bias,
                     name='projection')(out)
        )
        return nn.Dense(cfg.n_classes, dtype=dtype, use_bias=cfg.bias,
                        name='classifier')(out)
