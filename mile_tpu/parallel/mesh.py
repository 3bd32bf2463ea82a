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

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAIN_AXIS = 'chains'
DATA_AXIS = 'data'


def chain_mesh(n_devices: Optional[int] = None,
               devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over (a prefix of) the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (CHAIN_AXIS,))


def chain_data_mesh(n_chain_devices: int, n_data_devices: int,
                    devices: Optional[Sequence] = None) -> Mesh:
    """2-D ``(chains, data)`` mesh.

    The second axis shards the training set over devices *within* each
    chain group: the log-likelihood sum over observations becomes a
    GSPMD-inserted ``psum`` over ICI (SURVEY §7.4 — "sharded along a data
    axis with psum of log-lik contributions when it grows"). Lets
    ``n_chains < n_devices`` workloads use every chip instead of leaving
    the remainder idle.
    """
    if devices is None:
        devices = jax.devices()
    need = n_chain_devices * n_data_devices
    if len(devices) < need:
        raise ValueError(
            f'chain_data_mesh needs {need} devices '
            f'({n_chain_devices} chains x {n_data_devices} data), '
            f'have {len(devices)}')
    grid = np.asarray(devices[:need]).reshape(n_chain_devices, n_data_devices)
    return Mesh(grid, (CHAIN_AXIS, DATA_AXIS))


def pick_chain_device_count(n_chains: int, max_devices: Optional[int] = None,
                            quiet: bool = False) -> int:
    """Largest device count that divides ``n_chains``.

    The reference *asserts* divisibility (trainer.py:75-79); we degrade
    gracefully to the largest divisor so any chain count runs — loudly,
    because e.g. a prime chain count lands on 1 device (VERDICT r3
    weak 6). The sampling phase additionally pads the chain batch to a
    device multiple (:func:`padded_chain_count`) so the idle devices are
    actually used where it matters.
    """
    avail = len(jax.devices()) if max_devices is None else max_devices
    cap = min(avail, n_chains)
    n = cap
    while n_chains % n != 0:
        n -= 1
    if n < cap and not quiet:
        logging.getLogger(__name__).warning(
            '%d chains do not divide over %d devices; using %d device(s), '
            '%d idle. Pick n_chains as a multiple of the device count '
            '(sampling pads the chain batch automatically).',
            n_chains, avail, n, avail - n)
    return n


def padded_chain_count(n_chains: int,
                       max_devices: Optional[int] = None) -> int:
    """Chain count to actually *run* so every device is used.

    Smallest multiple of the device count >= ``n_chains`` — but only when
    that shrinks the per-device chain batch vs the largest-divisor mesh
    (13 chains / 8 devices: divisor puts 13 on 1 device; padding runs
    16 = 2/device on all 8). Returns ``n_chains`` unchanged when padding
    would not help (divisible counts, or fewer chains than devices).
    Extra chains are wrap-around duplicates of real chains with distinct
    RNG streams; callers slice them out of every result.
    """
    avail = len(jax.devices()) if max_devices is None else max_devices
    # quiet: the caller (trainer init) already warned via its own
    # pick_chain_device_count call, and padding usually FIXES the idle
    # devices the warning complains about (ADVICE r4)
    n_div = pick_chain_device_count(n_chains, max_devices, quiet=True)
    if avail <= 0 or n_chains <= avail:
        return n_chains
    padded = -(-n_chains // avail) * avail
    if padded // avail < n_chains // n_div:
        return padded
    return n_chains


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


def data_axis_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (observation) axis over ``data``; replicate the
    rest (including over ``chains``)."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_data(tree, mesh: Mesh):
    """Place every array with its leading axis sharded over the ``data``
    mesh axis (no-op replication when the mesh has no such axis).

    Arrays whose observation count does not divide the data-axis size are
    replicated instead (with a warning) — XLA requires even shards for
    explicit placement; results are identical either way, only the
    memory/collective layout differs.
    """
    if DATA_AXIS not in mesh.axis_names:
        return replicate(tree, mesh)
    n_shards = mesh.shape[DATA_AXIS]

    def place(x):
        if hasattr(x, 'ndim') and x.ndim >= 1:
            if x.shape[0] % n_shards == 0:
                return jax.device_put(x, data_axis_sharding(mesh, x.ndim))
            logging.getLogger(__name__).warning(
                'shard_data: leading dim %d not divisible by data axis '
                '%d; replicating', x.shape[0], n_shards)
        return jax.device_put(x, replicated_sharding(mesh))

    return jax.tree.map(place, tree)


def replicate(tree, mesh: Mesh):
    """Replicate every array in ``tree`` across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
