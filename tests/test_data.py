"""Data pipeline tests: transform shapes/ranges, loader determinism and
sharding, ImageFolder labeling, tokenizer padding."""

import os

import numpy as np
import pytest
from PIL import Image

from hqtransformer_tpu.data import transforms as T
from hqtransformer_tpu.data.datasets import (DataLoader, ImageFolderDataset,
                                             LoaderConfig)


@pytest.fixture(scope='module')
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('ds')
    rng = np.random.RandomState(0)
    for cls in ('a', 'b'):
        d = root / 'train' / cls
        d.mkdir(parents=True)
        for i in range(6):
            arr = (rng.rand(40, 48, 3) * 255).astype('uint8')
            Image.fromarray(arr).save(d / f'{i}.png')
    return str(root)


def test_transforms_shapes_and_range():
    rng = np.random.RandomState(0)
    img = Image.fromarray((rng.rand(50, 70, 3) * 255).astype('uint8'))
    for arr in (T.train_transform(img, 32, rng),
                T.train_transform(img, 32, rng, 'ffhq'),
                T.valid_transform(img, 32)):
        assert arr.shape == (32, 32, 3)
        assert arr.dtype == np.float32
        assert arr.min() >= -1.0 and arr.max() <= 1.0


def test_imagefolder_labels(fake_root):
    ds = ImageFolderDataset(fake_root, 'train')
    assert len(ds) == 12
    labels = {ds[i][1] for i in range(len(ds))}
    assert labels == {0, 1}


def test_loader_deterministic_and_sharded(fake_root):
    ds = ImageFolderDataset(fake_root, 'train')
    cfg = LoaderConfig(batch_size=4, resolution=32, train=True, seed=3)
    a = [x for x, _ in DataLoader(ds, cfg)]
    b = [x for x, _ in DataLoader(ds, cfg)]
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa, xb)

    # two shards partition the epoch
    c0 = LoaderConfig(batch_size=2, resolution=32, train=False,
                      shard_index=0, shard_count=2)
    c1 = LoaderConfig(batch_size=2, resolution=32, train=False,
                      shard_index=1, shard_count=2)
    n0 = sum(x.shape[0] for x, _ in DataLoader(ds, c0))
    n1 = sum(x.shape[0] for x, _ in DataLoader(ds, c1))
    assert n0 == n1 == 6


def test_tokenizer_padding():
    pytest.importorskip('tokenizers')
    from hqtransformer_tpu.data.tokenizers import create_tokenizer
    # no vocab_dir: resolves from the vendored assets
    # (hqtransformer_tpu/assets/tokenizers/) so txt2img is self-contained
    os.environ.pop('HQT_VOCAB_DIR', None)
    tok = create_tokenizer('bpe16k_huggingface')
    ids = tok.encode_padded('a small test caption', 16)
    assert len(ids) == 16
    ids2 = tok.encode_padded('a small test caption', 16)
    assert ids == ids2

    # an explicit vocab_dir takes precedence; the vendored files match the
    # reference's pretrained assets byte-for-byte
    if os.path.isdir('/root/reference/hqvae/tokenizers/pretrained'):
        tok2 = create_tokenizer(
            'bpe16k_huggingface',
            vocab_dir='/root/reference/hqvae/tokenizers/pretrained')
        assert tok2.encode_padded('a small test caption', 16) == ids
