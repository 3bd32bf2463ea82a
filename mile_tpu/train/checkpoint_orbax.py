"""Orbax-backed checkpointing for multi-host / sharded state.

The reference declares orbax as a dependency but never uses it
(pyproject.toml:14, SURVEY §5.4); here it is the native path for
checkpoints that must scale past one host: each process writes its own
shards of the (chain-sharded) ensemble state, and restore places shards
directly onto the target sharding. The npz layout in
:mod:`mile_tpu.train.checkpoint` remains the default for single-host
runs and report parity.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_ensemble(path: str | Path, params, step: int = 0) -> Path:
    """Write the member-stacked ParamTree as an orbax checkpoint.

    Works with sharded arrays: on a multi-host mesh each process writes
    its own shards.
    """
    path = Path(path).absolute() / f'step_{step}'
    ckptr = _checkpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    logger.info('orbax checkpoint written to %s', path)
    return path


def load_ensemble(path: str | Path, template=None, step: Optional[int] = None):
    """Restore a member-stacked ParamTree.

    ``template`` (matching pytree of ShapeDtypeStruct or arrays, possibly
    sharded) drives placement; without it, arrays restore unsharded.
    """
    path = Path(path).absolute()
    if step is None:
        steps = sorted(int(p.name.split('_')[1])
                       for p in path.glob('step_*'))
        if not steps:
            raise FileNotFoundError(f'no orbax checkpoints under {path}')
        step = steps[-1]
    ckptr = _checkpointer()
    target = None
    if template is not None:
        target = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                x.shape, x.dtype,
                sharding=getattr(x, 'sharding', None)),
            template)
    return ckptr.restore(path / f'step_{step}', target)
