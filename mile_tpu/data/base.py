"""Data loader protocol.

Reference: /root/reference/src/dataset/base.py:10-53. TPU-first divergence:
batches have NO device axis — device placement is the runtime's job via
``jax.sharding`` (the reference bakes an ``n_devices`` leading axis into
every batch for pmap; we shard instead).
"""
from __future__ import annotations

import abc
from pathlib import Path
from typing import Iterator, Literal

import jax.numpy as jnp

from mile_tpu.config.data import DataConfig, Task

Split = Literal['train', 'valid', 'test']

_REPO_ROOT = Path(__file__).resolve().parents[2]


def resolve_data_path(path: str | Path) -> Path:
    """Resolve a data path against cwd, then the repo root."""
    p = Path(path)
    if p.exists():
        return p
    alt = _REPO_ROOT / p
    if alt.exists():
        return alt
    raise FileNotFoundError(f'data file not found: {path} (also tried {alt})')


class BaseLoader(abc.ABC):
    """Common interface over tabular / image / text datasets."""

    def __init__(self, config: DataConfig):
        self.config = config

    @abc.abstractmethod
    def arrays(self, split: Split) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Full (features, labels) arrays for a split."""

    @abc.abstractmethod
    def iter(self, split: Split, batch_size: int | None = None) -> Iterator[dict]:
        """Yield ``{'feature': x, 'label': y}`` batches; full batch if None."""

    @abc.abstractmethod
    def shuffle(self, split: Split = 'train') -> None:
        """Reshuffle a split in place for the next epoch."""

    @abc.abstractmethod
    def __len__(self) -> int:
        ...

    def epoch_batch_indices(self, batch_size: int, n_members: int):
        """Per-member minibatch index plan: (n_members, n_batches, B) int32.

        Each ensemble member gets its OWN permutation of the training rows
        (the reference's per-device splits, src/dataset/tabular.py:193-197)
        — the trainer gathers rows on device, so an epoch stays one
        compiled scan while members see different batch compositions.
        """
        import numpy as np

        n = int(self.arrays('train')[0].shape[0])
        n_batches = max(1, n // batch_size)
        rng = getattr(self, '_rng', np.random.default_rng(0))
        plan = np.stack([
            rng.permutation(n)[: n_batches * batch_size].reshape(
                n_batches, batch_size)
            for _ in range(n_members)])
        return plan.astype('int32')

    # convenience accessors matching the reference property surface
    @property
    def train_x(self):
        return self.arrays('train')[0]

    @property
    def train_y(self):
        return self.arrays('train')[1]

    @property
    def valid_x(self):
        return self.arrays('valid')[0]

    @property
    def valid_y(self):
        return self.arrays('valid')[1]

    @property
    def test_x(self):
        return self.arrays('test')[0]

    @property
    def test_y(self):
        return self.arrays('test')[1]

    def _label_dtype(self, y: jnp.ndarray) -> jnp.ndarray:
        if self.config.task == Task.CLASSIFICATION:
            return y.astype(jnp.int32)
        return y

    def __str__(self):
        return (
            f'{type(self).__name__}:\n'
            f' | path: {self.config.path}\n'
            f' | task: {self.config.task}'
        )
