"""Image data loader (MNIST / FashionMNIST / CIFAR10 + local archives).

Reference: /root/reference/src/dataset/image.py:16-291 (torchvision
download, /255 normalization, NCHW layout, fractional splits). Here local
``.npz`` archives (keys ``x``/``y`` or ``train_x``/``train_y``/...) are
first-class — torchvision is import-gated and only used when
``source: torchvision`` is configured AND the package is installed.
"""
from __future__ import annotations

from typing import Iterator

import jax.numpy as jnp
import numpy as np

from mile_tpu.config.data import DataConfig, DatasetType, Source, Task
from mile_tpu.data.base import BaseLoader, Split, resolve_data_path
from mile_tpu.data.tabular import _np_rng

TORCHVISION_SETS = {'MNIST', 'FashionMNIST', 'CIFAR10'}


class ImageLoader(BaseLoader):
    def __init__(self, config: DataConfig, rng):
        super().__init__(config)
        assert config.data_type == DatasetType.IMAGE
        self._rng = _np_rng(rng)
        x, y = self._load()
        if config.normalize:
            x = x / 255.0
        if x.ndim == 3:  # add channel dim -> NCHW
            x = x[:, None, :, :]
        perm = self._rng.permutation(len(x))
        x, y = x[perm], y[perm]
        if config.datapoint_limit:
            x, y = x[: config.datapoint_limit], y[: config.datapoint_limit]
        n = len(x)
        n_train = int(n * config.train_split)
        n_valid = int(n * (config.train_split + config.valid_split))
        self._x = {'train': x[:n_train], 'valid': x[n_train:n_valid],
                   'test': x[n_valid:]}
        self._y = {'train': y[:n_train], 'valid': y[n_train:n_valid],
                   'test': y[n_valid:]}

    # ------------------------------------------------------------ loading
    def _load(self) -> tuple[np.ndarray, np.ndarray]:
        if self.config.source == Source.TORCHVISION:
            return self._load_torchvision(self.config.path)
        path = resolve_data_path(self.config.path)
        with np.load(path) as data:
            if 'x' in data:
                x, y = data['x'], data['y']
            else:  # pre-split archive: concatenate, we re-split by config
                x = np.concatenate([data[f'{s}_x']
                                    for s in ('train', 'valid', 'test')
                                    if f'{s}_x' in data])
                y = np.concatenate([data[f'{s}_y']
                                    for s in ('train', 'valid', 'test')
                                    if f'{s}_y' in data])
        return (np.asarray(x, np.float32), np.asarray(y))

    @staticmethod
    def _load_torchvision(name: str) -> tuple[np.ndarray, np.ndarray]:
        try:
            import torchvision
        except ImportError as e:
            raise ImportError(
                f'source=torchvision requires the torchvision package '
                f'(dataset {name}); provide a local .npz instead'
            ) from e
        if name not in TORCHVISION_SETS:
            raise ValueError(f'unsupported torchvision dataset {name}; '
                             f'options: {sorted(TORCHVISION_SETS)}')
        cls = getattr(torchvision.datasets, name)
        train = cls('data/_torchvision', train=True, download=True)
        test = cls('data/_torchvision', train=False, download=True)
        x = np.concatenate([np.asarray(train.data, np.float32),
                            np.asarray(test.data, np.float32)])
        y = np.concatenate([np.asarray(train.targets),
                            np.asarray(test.targets)])
        if x.ndim == 4 and x.shape[-1] in (1, 3):  # NHWC -> NCHW
            x = x.transpose(0, 3, 1, 2)
        return x, y

    # ----------------------------------------------------------- protocol
    def arrays(self, split: Split):
        return (jnp.asarray(self._x[split]),
                jnp.asarray(self._label_dtype(jnp.asarray(self._y[split]))))

    def iter(self, split: Split, batch_size: int | None = None) -> Iterator[dict]:
        x, y = self._x[split], self._y[split]
        if not len(x):
            return
        if batch_size is None:
            fx, fy = self.arrays(split)
            yield {'feature': fx, 'label': fy}
            return
        n_batches = len(x) // batch_size
        perm = self._rng.permutation(len(x))[: n_batches * batch_size]
        for ids in perm.reshape(n_batches, batch_size):
            yield {'feature': jnp.asarray(x[ids]),
                   'label': self._label_dtype(jnp.asarray(y[ids]))}

    def epoch_batches(self, batch_size: int):
        x, y = self._x['train'], self._y['train']
        n_batches = len(x) // batch_size
        perm = self._rng.permutation(len(x))[: n_batches * batch_size]
        bx = x[perm].reshape(n_batches, batch_size, *x.shape[1:])
        by = y[perm].reshape(n_batches, batch_size, *y.shape[1:])
        if self.config.task == Task.CLASSIFICATION:
            by = by.astype(np.int32)
        return jnp.asarray(bx), jnp.asarray(by)

    def shuffle(self, split: Split = 'train') -> None:
        perm = self._rng.permutation(len(self._x[split]))
        self._x[split] = self._x[split][perm]
        self._y[split] = self._y[split][perm]

    def __len__(self):
        return sum(len(v) for v in self._x.values())
