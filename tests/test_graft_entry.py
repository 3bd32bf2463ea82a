"""Guard the driver entry points (`__graft_entry__.py`).

The round driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(n)`` on a virtual n-device mesh; a regression here
fails the round even when the framework itself is healthy, so keep both
covered by CI (conftest forces an 8-virtual-device CPU platform — the
same environment the driver uses for the dry run).
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_entry_jits_and_runs():
    fn, args = graft.entry()
    pos, de = jax.jit(fn)(*args)
    assert pos.ndim == 1 and pos.shape[0] > 0
    assert jnp.isfinite(de)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
