"""PyTree helpers."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def count_params(tree) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(x.size for x in jax.tree.leaves(tree))


def tree_stack(trees):
    """Stack a list of identical pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def tree_unstack(tree):
    """Split a pytree with a leading axis into a list of pytrees."""
    n = jax.tree.leaves(tree)[0].shape[0]
    return [jax.tree.map(lambda x: x[i], tree) for i in range(n)]
