"""Parameter-subspace partitioning (MILE partition mode).

Reference: /root/reference/src/training/partition_sampling.py:304-315 +
trainer.py:890-901: sample only the input and output layers, freeze the
hidden layers at their warmstart values (a dimension-reduction strategy,
SURVEY §2.3). The reference does pytree surgery + a hand-rolled partition
forward pass; in flat space the whole mechanism is an index set:

- ``partition_mask``: boolean (dim,) marking sampled coordinates
  (first + last layer group in flat layout order);
- sampling runs in the subspace ``z = theta[idx]`` with the density
  ``logdensity(base.at[idx].set(z))`` where ``base`` holds each chain's
  frozen coordinates (an XLA scatter fused into the posterior program);
- saved samples are merged back to full dimension.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def layer_groups(template_params) -> list[tuple[str, int, int]]:
    """Ordered (layer_name, start, end) flat slices, grouping leaves by
    their parent module path (e.g. ``fcn/layer0`` holds kernel+bias)."""
    groups: list[tuple[str, int, int]] = []
    offset = 0
    flat = jax.tree_util.tree_flatten_with_path(template_params)[0]
    for path, leaf in flat:
        # parent path = everything but the leaf key (kernel/bias/...)
        name = '/'.join(
            getattr(k, 'key', str(k)) for k in path[:-1]) or 'root'
        if groups and groups[-1][0] == name:
            groups[-1] = (name, groups[-1][1], offset + leaf.size)
        else:
            groups.append((name, offset, offset + leaf.size))
        offset += leaf.size
    return groups


def partition_mask(template_params, dim: int) -> np.ndarray:
    """True = sampled (first + last layer group); False = frozen hidden."""
    groups = layer_groups(template_params)
    mask = np.zeros(dim, dtype=bool)
    first, last = groups[0], groups[-1]
    mask[first[1]:first[2]] = True
    mask[last[1]:last[2]] = True
    return mask


def frozen_mask(template_params, dim: int,
                frozen_names: 'list[str]') -> np.ndarray:
    """True = sampled; layer groups whose name contains any entry of
    ``frozen_names`` are frozen (SamplerConfig.params_frozen)."""
    mask = np.ones(dim, dtype=bool)
    matched = False
    for name, start, end in layer_groups(template_params):
        if any(f in name for f in frozen_names):
            mask[start:end] = False
            matched = True
    if not matched:
        raise ValueError(
            f'params_frozen {frozen_names} matched no layer; layers: '
            f'{[g[0] for g in layer_groups(template_params)]}')
    return mask


def partition_labels(template_params) -> dict:
    """Label tree for ``optax.multi_transform``: first/last layer group ->
    'input_output_layers', everything else -> 'hidden_layers'
    (reference map_nested_fn + fn, trainer.py:940-960)."""
    groups = layer_groups(template_params)
    sampled = {groups[0][0], groups[-1][0]}

    def label(path):
        name = '/'.join(
            getattr(k, 'key', str(k)) for k in path[:-1]) or 'root'
        return ('input_output_layers' if name in sampled
                else 'hidden_layers')

    flat = jax.tree_util.tree_flatten_with_path(template_params)
    labels = [label(p) for p, _ in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], labels)


def partition_optimizer(tx, template_params):
    """Optimizer that trains only the input/output layers."""
    import optax

    return optax.multi_transform(
        {'input_output_layers': tx, 'hidden_layers': optax.set_to_zero()},
        partition_labels(template_params))


def make_partitioned_logdensity(
    logdensity_fn: Callable, mask: np.ndarray
) -> Callable:
    """(z, base) -> logdensity of ``base`` with sampled coords replaced."""
    idx = jnp.asarray(np.nonzero(mask)[0])

    def partitioned(z: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
        return logdensity_fn(base.at[idx].set(z))

    return partitioned


def split(theta: jnp.ndarray, mask: np.ndarray) -> jnp.ndarray:
    """Extract the sampled subvector (works on (dim,) or (..., dim))."""
    idx = np.nonzero(mask)[0]
    return theta[..., idx]


def merge(base: np.ndarray, z: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Merge sampled draws back into full dimension.

    ``base``: (n_chains, dim) frozen values; ``z``: (n_chains, n_kept,
    d_sub) draws -> (n_chains, n_kept, dim).
    """
    base = np.asarray(base)
    z = np.asarray(z)
    out = np.broadcast_to(base[:, None, :],
                          (*z.shape[:2], base.shape[-1])).copy()
    out[..., np.nonzero(mask)[0]] = z
    return out
