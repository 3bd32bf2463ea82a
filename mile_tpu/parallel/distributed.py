"""Multi-host runtime initialization.

The reference is single-process (SURVEY §2.4); scaling beyond one host is
native here: call :func:`initialize_distributed` once per host before
building the chain mesh, and ``jax.devices()`` spans all hosts — chains
shard across hosts over ICI/DCN, host-local IO writes each host's shard.

In-program cross-chain reductions (pooled R-hat/ESS/LPPD) need no special
code: computing them under ``jit`` on chain-sharded arrays makes XLA
insert the collectives over the mesh (see tests/test_sharded_diagnostics).
"""
from __future__ import annotations

import logging
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize ``jax.distributed`` (no-op when already initialized or
    single-process with no coordinator configured).

    All arguments fall back to JAX's environment-based auto-detection
    (works out of the box on TPU pods).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info('jax.distributed initialized: process %d/%d, %d local '
                    'of %d global devices', jax.process_index(),
                    jax.process_count(), jax.local_device_count(),
                    jax.device_count())
    except (RuntimeError, ValueError) as e:
        logger.info('jax.distributed not initialized (%s); running '
                    'single-process', e)


def is_primary_host() -> bool:
    return jax.process_index() == 0
