"""Inference helpers (reference: /root/reference/src/inference/utils.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def count_chains(tree) -> int:
    """Leading-axis size, validated consistent across leaves."""
    sizes = {leaf.shape[0] for leaf in jax.tree.leaves(tree)}
    if len(sizes) != 1:
        raise ValueError(f'inconsistent chain axes: {sizes}')
    return sizes.pop()


def count_samples(tree) -> int:
    """Second-axis size, validated consistent across leaves."""
    sizes = {leaf.shape[1] for leaf in jax.tree.leaves(tree)}
    if len(sizes) != 1:
        raise ValueError(f'inconsistent sample axes: {sizes}')
    return sizes.pop()


def get_mem_size(tree) -> int:
    """Total bytes of all leaves."""
    return sum(leaf.size * leaf.dtype.itemsize
               for leaf in jax.tree.leaves(tree))


def count_nan(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.isnan(x).sum()


def impute_nan(x: jnp.ndarray, value: float = 0.0) -> jnp.ndarray:
    return jnp.nan_to_num(x, nan=value)
