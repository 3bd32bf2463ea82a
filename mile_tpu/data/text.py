"""Text data loader: tokenized, padded classification corpora.

Reference: /root/reference/src/dataset/text.py:33-298 (HF datasets or
local files, rare-char filtering, tokenizer training, padding to
``context_len``, label encoding, tabular-style splits). Local formats are
first-class here:

- ``.csv``: ``text,label`` header (label may be a string class name);
- ``.txt``: tab-separated ``text<TAB>label`` per line;
- ``source: huggingface``: dataset name via the ``datasets`` package
  (import-gated; requires network/cache).
"""
from __future__ import annotations

import csv
from collections import Counter
from typing import Iterator

import jax.numpy as jnp
import numpy as np

from mile_tpu.config.data import DataConfig, DatasetType, Source, Task
from mile_tpu.data.base import BaseLoader, Split, resolve_data_path
from mile_tpu.data.tabular import _np_rng
from mile_tpu.data.tokenizers import SingleCharTokenizer, Tokenizer, build_tokenizer


def omit_rare_chars(texts: list[str], min_freq: int) -> list[str]:
    """Drop characters rarer than ``min_freq`` in the corpus."""
    counts = Counter(''.join(texts))
    keep = {c for c, n in counts.items() if n >= min_freq}
    return [''.join(c for c in t if c in keep) for t in texts]


class TextLoader(BaseLoader):
    def __init__(self, config: DataConfig, rng, tokenizer: Tokenizer | None = None,
                 tokenizer_config=None, context_len: int = 64,
                 omit_freq: int = 0):
        super().__init__(config)
        assert config.data_type == DatasetType.TEXT
        self._rng = _np_rng(rng)
        if tokenizer is None:
            if tokenizer_config is not None:
                params = dict(tokenizer_config.parameters)
                context_len = params.pop('context_len', context_len)
                omit_freq = params.pop('omit_freq', omit_freq)
                tokenizer = build_tokenizer(tokenizer_config.name, **params)
            else:
                tokenizer = SingleCharTokenizer()
        self.tokenizer = tokenizer
        self.context_len = context_len

        texts, labels = self._load()
        if omit_freq:
            texts = omit_rare_chars(texts, omit_freq)
        if self.tokenizer.needs_training:
            self.tokenizer.train(texts)

        x = self.tokenizer.encode_batch(texts, context_len)
        y = self._encode_labels(labels)

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
    def _load(self) -> tuple[list[str], list]:
        if self.config.source == Source.HUGGINGFACE:
            return self._load_hf()
        path = resolve_data_path(self.config.path)
        texts, labels = [], []
        if path.suffix == '.csv':
            text_col = (self.config.features or ['text'])[0]
            label_col = self.config.target_column or 'label'
            with open(path, newline='') as f:
                for row in csv.DictReader(f):
                    texts.append(row[text_col])
                    labels.append(row[label_col])
        else:  # .txt: text<TAB>label
            for line in path.read_text().splitlines():
                if not line.strip():
                    continue
                text, _, label = line.rpartition('\t')
                texts.append(text)
                labels.append(label)
        return texts, labels

    def _load_hf(self) -> tuple[list[str], list]:
        try:
            from datasets import load_dataset
        except ImportError as e:
            raise ImportError(
                'source=huggingface requires the `datasets` package'
            ) from e
        import os

        # a local file routes through the datasets CSV/JSON builders, so
        # the HF integration is exercised (and testable) without network
        # egress; a bare name hits the hub like the reference
        # (/root/reference/src/dataset/text.py:33-72, load_dataset('imdb'))
        path = str(self.config.path)
        if os.path.exists(path):
            builder = {'.csv': 'csv', '.json': 'json',
                       '.jsonl': 'json'}.get(os.path.splitext(path)[1])
            if builder is None:
                raise ValueError(
                    f'source=huggingface with a local file needs .csv or '
                    f'.json(l), got {path!r}')
            ds = load_dataset(builder, data_files=path, split='train')
        else:
            ds = load_dataset(path, split='train')
        text_col = (self.config.features or ['text'])[0]
        label_col = self.config.target_column or 'label'
        return list(ds[text_col]), list(ds[label_col])

    def _encode_labels(self, labels: list) -> np.ndarray:
        if self.config.task == Task.REGRESSION:
            return np.asarray([float(v) for v in labels], np.float32)
        if labels and isinstance(labels[0], str) and not _all_numeric(labels):
            classes = sorted(set(labels))
            self.classes_ = classes
            index = {c: i for i, c in enumerate(classes)}
            return np.asarray([index[v] for v in labels], np.int32)
        return np.asarray([int(float(v)) for v in labels], np.int32)

    # ----------------------------------------------------------- protocol
    def arrays(self, split: Split):
        return (jnp.asarray(self._x[split]),
                self._label_dtype(jnp.asarray(self._y[split])))

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
        return (jnp.asarray(x[perm].reshape(n_batches, batch_size, -1)),
                jnp.asarray(y[perm].reshape(n_batches, batch_size)))

    def shuffle(self, split: Split = 'train') -> None:
        perm = self._rng.permutation(len(self._x[split]))
        self._x[split] = self._x[split][perm]
        self._y[split] = self._y[split][perm]

    def __len__(self):
        return sum(len(v) for v in self._x.values())


def _all_numeric(labels: list) -> bool:
    try:
        [float(v) for v in labels]
        return True
    except (TypeError, ValueError):
        return False
