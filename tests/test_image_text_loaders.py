"""Image/text loader + tokenizer tests on synthetic local data."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mile_tpu.config.data import DataConfig, DatasetType, Task
from mile_tpu.config.models import AttentionClassifierConfig, LeNettiConfig
from mile_tpu.data.image import ImageLoader
from mile_tpu.data.text import TextLoader, omit_rare_chars
from mile_tpu.data.tokenizers import SingleCharTokenizer
from mile_tpu.models import build_model


@pytest.fixture
def image_npz(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (200, 8, 8)).astype(np.float32)
    y = rng.integers(0, 3, 200)
    p = tmp_path / 'imgs.npz'
    np.savez(p, x=x, y=y)
    return p


@pytest.fixture
def text_csv(tmp_path):
    rng = np.random.default_rng(1)
    p = tmp_path / 'texts.csv'
    rows = ['text,label']
    for _ in range(120):
        n = rng.integers(3, 20)
        word = ''.join(rng.choice(list('abcdef '), n))
        rows.append(f'"{word}",{"pos" if rng.random() < 0.5 else "neg"}')
    p.write_text('\n'.join(rows))
    return p


def test_image_loader_shapes(image_npz):
    cfg = DataConfig(path=str(image_npz), data_type=DatasetType.IMAGE,
                     task=Task.CLASSIFICATION, train_split=0.7,
                     valid_split=0.15, test_split=0.15)
    loader = ImageLoader(cfg, 0)
    x, y = loader.arrays('train')
    assert x.shape == (140, 1, 8, 8)       # channel dim added, NCHW
    assert y.dtype == jnp.int32
    assert float(x.max()) <= 1.0           # /255 normalized
    bx, by = loader.epoch_batches(32)
    assert bx.shape == (4, 32, 1, 8, 8)
    # feeds LeNetti end to end
    model = build_model(LeNettiConfig(out_dim=3))
    params = model.init(jax.random.PRNGKey(1), x[:2])['params']
    assert model.apply({'params': params}, x[:5]).shape == (5, 3)


def test_single_char_tokenizer_roundtrip():
    tok = SingleCharTokenizer()
    tok.train(['hello world'])
    ids = tok.encode('hello')
    assert tok.decode(ids) == 'hello'
    assert tok.pad(ids, 8) == ids + [0, 0, 0]
    assert tok.vocab_size == len(set('hello world')) + 1


def test_omit_rare_chars():
    out = omit_rare_chars(['aaab', 'aaac'], min_freq=3)
    assert out == ['aaa', 'aaa']


def test_text_loader_end_to_end(text_csv):
    cfg = DataConfig(path=str(text_csv), data_type=DatasetType.TEXT,
                     task=Task.CLASSIFICATION, train_split=0.7,
                     valid_split=0.15, test_split=0.15)
    loader = TextLoader(cfg, 0, context_len=24)
    x, y = loader.arrays('train')
    assert x.shape[1] == 24
    assert x.dtype == jnp.int32
    assert set(np.asarray(y)) <= {0, 1}    # pos/neg encoded
    assert loader.classes_ == ['neg', 'pos']
    # tokens within vocab, padding id 0 present
    assert int(x.max()) < loader.tokenizer.vocab_size
    # feeds the attention classifier
    model = build_model(AttentionClassifierConfig(
        vocab_size=loader.tokenizer.vocab_size, context_len=24, emb_size=16,
        n_heads=2, qkv_dim=16, n_classes=2, projection_dim=[8]))
    params = model.init(jax.random.PRNGKey(1), x[:2])['params']
    assert model.apply({'params': params}, x[:5]).shape == (5, 2)


def test_build_loader_dispatch(image_npz, text_csv):
    from mile_tpu.data import build_loader

    img = build_loader(
        DataConfig(path=str(image_npz), data_type=DatasetType.IMAGE,
                   task=Task.CLASSIFICATION), 0)
    assert isinstance(img, ImageLoader)
    txt = build_loader(
        DataConfig(path=str(text_csv), data_type=DatasetType.TEXT,
                   task=Task.CLASSIFICATION), 0)
    assert isinstance(txt, TextLoader)


def test_torchvision_gated_error():
    cfg = DataConfig(path='MNIST', source='torchvision',
                     data_type=DatasetType.IMAGE, task=Task.CLASSIFICATION)
    with pytest.raises(ImportError, match='torchvision'):
        ImageLoader(cfg, 0)


def test_torchvision_download_path(monkeypatch):
    """Exercise the torchvision branch offline with a faked module.

    The reference downloads MNIST/FashionMNIST/CIFAR10 via torchvision
    (/root/reference/src/dataset/image.py:16-291); the package is absent
    in this image, so the branch's real logic (train+test concat, NHWC →
    NCHW transpose, /255 normalize, split) is driven through a stub that
    mimics ``torchvision.datasets.<Name>(root, train=..., download=...)``.
    """
    import sys
    import types

    rng = np.random.default_rng(3)

    class _FakeCIFAR:
        def __init__(self, root, train, download):
            assert download is True
            n = 48 if train else 16
            # torchvision CIFAR10 exposes uint8 NHWC .data + list targets
            self.data = rng.integers(0, 255, (n, 8, 8, 3)).astype(np.uint8)
            self.targets = list(rng.integers(0, 10, n))

    fake = types.ModuleType('torchvision')
    fake.datasets = types.SimpleNamespace(CIFAR10=_FakeCIFAR)
    monkeypatch.setitem(sys.modules, 'torchvision', fake)

    cfg = DataConfig(path='CIFAR10', source='torchvision',
                     data_type=DatasetType.IMAGE, task=Task.CLASSIFICATION,
                     train_split=0.75, valid_split=0.125, test_split=0.125)
    loader = ImageLoader(cfg, 0)
    x, y = loader.arrays('train')
    assert x.shape == (48, 3, 8, 8)            # 64 total * 0.75, NCHW
    assert float(x.max()) <= 1.0 and float(x.min()) >= 0.0
    assert y.dtype == jnp.int32
    assert len(loader) == 64                   # train+test concatenated

    # unsupported dataset names are rejected before any download attempt
    bad = DataConfig(path='SVHN', source='torchvision',
                     data_type=DatasetType.IMAGE, task=Task.CLASSIFICATION)
    with pytest.raises(ValueError, match='SVHN'):
        ImageLoader(bad, 0)


def test_config_json_roundtrip(tmp_path):
    cfg = DataConfig(path='data/airfoil.data')
    p = tmp_path / 'cfg.json'
    cfg.to_json(p)
    assert DataConfig.from_json(p) == cfg
