"""Chain-axis device mesh.

TPU-native replacement for the reference's pmap + Python ``train_plan``
batching (/root/reference/src/training/trainer.py:75-82,419-423): ONE
``jax.sharding.Mesh`` with a ``chains`` axis; every per-chain computation
is vmapped over a leading chain axis and sharded across the mesh with
``NamedSharding``. ``n_chains >> n_devices`` is just a bigger batch — one
compiled program, no host loop, and XLA overlaps chains freely.

Multi-host: initialize ``jax.distributed`` before calling
:func:`chain_mesh`; ``jax.devices()`` then spans hosts and the chain axis
rides ICI/DCN transparently.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAIN_AXIS = 'chains'


def chain_mesh(n_devices: Optional[int] = None,
               devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over (a prefix of) the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CHAIN_AXIS,))


def pick_chain_device_count(n_chains: int, max_devices: Optional[int] = None) -> int:
    """Largest device count that divides ``n_chains``.

    The reference *asserts* divisibility (trainer.py:75-79); we degrade
    gracefully to the largest divisor so any chain count runs.
    """
    avail = len(jax.devices()) if max_devices is None else max_devices
    n = min(avail, n_chains)
    while n_chains % n != 0:
        n -= 1
    return n


def chain_axis_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (chain) axis; replicate the rest."""
    return NamedSharding(mesh, P(CHAIN_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_chains(tree, mesh: Mesh):
    """Place every array in ``tree`` with its leading axis sharded over chains."""
    def place(x):
        if hasattr(x, 'ndim') and x.ndim >= 1:
            return jax.device_put(x, chain_axis_sharding(mesh, x.ndim))
        return jax.device_put(x, replicated_sharding(mesh))

    return jax.tree.map(place, tree)


def replicate(tree, mesh: Mesh):
    """Replicate every array in ``tree`` across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
