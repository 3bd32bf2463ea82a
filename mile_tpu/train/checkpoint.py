"""Parameter / sample persistence.

Reference: /root/reference/src/training/utils.py:18-250 (npz-per-leaf
checkpoints + pickled treedef; one .npz per draw). Our native layout is
column-oriented: ONE compressed ``samples.npz`` per chain holding the flat
(n_kept, dim) sample matrix plus the pytree metadata needed to unravel —
written once per chunk instead of once per draw (the reference's
``io_callback``-per-step serializes device steps on host IO). A
reference-compatible per-draw writer is kept for parity
(``stream_samples``).
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

TREE_FILE = 'tree'


# ------------------------------------------------------------- warmstart
def save_params(path: str | Path, params, chain_id: int) -> None:
    """Save one member's ParamTree as ``params_{chain}.npz`` + treedef."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree.flatten(jax.device_get(params))
    np.savez_compressed(
        path / f'params_{chain_id}.npz',
        **{f'leaf_{i}': leaf for i, leaf in enumerate(leaves)})
    save_treedef(path, treedef)


def save_treedef(path: str | Path, treedef) -> None:
    with open(Path(path) / TREE_FILE, 'wb') as f:
        pickle.dump(treedef, f)


def load_treedef(path: str | Path):
    with open(Path(path) / TREE_FILE, 'rb') as f:
        return pickle.load(f)


def load_params(path: str | Path, chain_id: int):
    path = Path(path)
    treedef = load_treedef(path)
    with np.load(path / f'params_{chain_id}.npz') as data:
        leaves = [data[f'leaf_{i}'] for i in range(len(data.files))]
    return jax.tree.unflatten(treedef, leaves)


def load_params_batch(path: str | Path, chain_ids: Sequence[int]):
    """Load N member checkpoints stacked on a leading chain axis."""
    trees = [load_params(path, i) for i in chain_ids]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def list_checkpoints(path: str | Path) -> list[int]:
    return sorted(
        int(p.stem.split('_')[1]) for p in Path(path).glob('params_*.npz'))


# --------------------------------------------------------------- samples
def save_chain_samples(path: str | Path, chain_id: int,
                       flat_samples: np.ndarray, append: bool = False) -> None:
    """Write a chain's flat (n_kept, dim) sample block."""
    chain_dir = Path(path) / f'chain_{chain_id}'
    chain_dir.mkdir(parents=True, exist_ok=True)
    target = chain_dir / 'samples.npy'
    if append and target.exists():
        flat_samples = np.concatenate([np.load(target), flat_samples])
    np.save(target, np.asarray(flat_samples))


def save_samples(path: str | Path, flat_samples, unravel=None,
                 append: bool = False) -> None:
    """Save (n_chains, n_kept, dim) samples, one file per chain."""
    flat_samples = np.asarray(jax.device_get(flat_samples))
    for c in range(flat_samples.shape[0]):
        save_chain_samples(path, c, flat_samples[c], append=append)


def save_samples_streaming(path: str | Path, chain_id: int, draw_id: int,
                           position_tree) -> None:
    """Reference-compatible per-draw writer: samples/{chain}/sample_{n}.npz
    with one entry per leaf path (callbacks.py:17-44)."""
    chain_dir = Path(path) / f'{chain_id}'
    chain_dir.mkdir(parents=True, exist_ok=True)
    flat = jax.tree_util.tree_flatten_with_path(jax.device_get(position_tree))
    arrays = {
        jax.tree_util.keystr(kp): np.asarray(v) for kp, v in flat[0]
    }
    np.savez_compressed(chain_dir / f'sample_{draw_id}.npz', **arrays)


def load_flat_samples(path: str | Path) -> np.ndarray:
    """Load all chains' flat samples -> (n_chains, n_kept, dim).

    Understands both layouts: ``samples.npy`` (checkpoint writer) and
    ``samples.bin`` + ``samples.meta`` (native async sink).
    """
    import json

    path = Path(path)
    chains = sorted(path.glob('chain_*'),
                    key=lambda p: int(p.name.split('_')[1]))
    if not chains:
        raise FileNotFoundError(f'no chain_* dirs under {path}')

    def load_chain(c: Path) -> np.ndarray:
        if (c / 'samples.npy').exists():
            return np.load(c / 'samples.npy')
        meta = json.loads((c / 'samples.meta').read_text())
        raw = np.fromfile(c / 'samples.bin', dtype=meta['dtype'])
        return raw.reshape(-1, meta['dim'])

    return np.stack([load_chain(c) for c in chains])


def save_warmup_params(path: str | Path, step_size, L) -> None:
    """Tuned-parameter file, format-compatible with the reference
    (sampling.py:89-97): line 1 = step sizes, line 2 = Ls, comma-joined."""
    step_size = np.atleast_1d(np.asarray(step_size))
    L = np.atleast_1d(np.asarray(L))
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, 'w') as f:
        f.write(','.join(str(s) for s in step_size) + '\n')
        f.write(','.join(str(s) for s in L) + '\n')


def load_warmup_params(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    with open(path) as f:
        lines = f.read().strip().split('\n')
    return (np.array([float(v) for v in lines[0].split(',')]),
            np.array([float(v) for v in lines[1].split(',')]))
