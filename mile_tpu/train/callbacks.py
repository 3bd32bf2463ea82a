"""In-scan host callbacks: progress reporting and per-draw persistence.

Reference: /root/reference/src/training/callbacks.py (tqdm driven from
inside ``lax.scan`` via ``jax.debug.callback``; ``io_callback`` per-draw
npz writer). Both exist here for observability/parity, but the default
runtimes DON'T use per-step callbacks — host round-trips inside the scan
serialize device steps, which is exactly what the chunked device-buffer
design avoids. The progress callback fires only every ``update_every``
steps to bound that cost.
"""
from __future__ import annotations

import logging
import sys
from functools import partial
from pathlib import Path

import jax
import numpy as np

logger = logging.getLogger(__name__)


def progress_bar_scan(n_steps: int, name: str = '', update_every: int = 0):
    """Wrap a scan body so it reports progress from inside the scan.

    ``update_every`` defaults to ~1% of ``n_steps``.
    """
    update_every = update_every or max(1, n_steps // 100)

    def _report(step):
        step = int(step) + 1
        pct = 100.0 * step / n_steps
        sys.stderr.write(f'\r{name}: {step}/{n_steps} ({pct:.0f}%)')
        if step >= n_steps:
            sys.stderr.write('\n')
        sys.stderr.flush()

    def decorator(body):
        def wrapped(carry, xs):
            step = xs[0] if isinstance(xs, tuple) else xs

            def maybe(step):
                jax.lax.cond(
                    (step % update_every == 0) | (step == n_steps - 1),
                    lambda s: jax.debug.callback(_report, s),
                    lambda s: None,
                    step)

            maybe(step)
            return body(carry, xs)

        return wrapped

    return decorator


def save_position(position_tree, idx, n, base: Path):
    """Host target for per-draw persistence (reference callbacks.py:17-44):
    writes ``{base}/{idx}/sample_{n}.npz`` with one entry per leaf."""
    chain_dir = Path(base) / str(int(idx))
    chain_dir.mkdir(parents=True, exist_ok=True)
    flat = jax.tree_util.tree_flatten_with_path(position_tree)[0]
    np.savez_compressed(
        chain_dir / f'sample_{int(n)}.npz',
        **{jax.tree_util.keystr(kp): np.asarray(v) for kp, v in flat})
    return position_tree


def io_save_position(position_tree, idx, n, base: Path):
    """``io_callback`` wrapper usable inside jitted scans."""
    return jax.experimental.io_callback(
        partial(save_position, base=base),
        position_tree, position_tree, idx, n)
