"""Datasets and the per-host input pipeline.

Equivalent of the reference's `DatasetModule(pl.LightningDataModule)` and
dataset classes (`hqvae/datasets/__init__.py:26-303`): ImageNet
(ImageFolder layout), FFHQ / generic file-list folders, CC3M (tsv of
image-path<TAB>caption) and CC15M (CC3M + CC12M concat). torchvision's
DataLoader is replaced by a grain-based pipeline (multi-worker, deterministic
sharding per host) with a threaded fallback.

Dataset root dirs are arguments (the reference leaves them as empty
constants to fill in, `datasets/__init__.py:21-24`).
"""

from __future__ import annotations

import bisect
import os
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from . import transforms as T

IMG_EXTENSIONS = ('.jpg', '.jpeg', '.png', '.bmp', '.webp')


class ImageFolderDataset:
    """torchvision-ImageFolder-compatible: root/<class>/<img> with labels by
    sorted class-dir order (`datasets/__init__.py:110-113` wraps this)."""

    def __init__(self, root: str, split_subdir: str = ''):
        base = os.path.join(root, split_subdir) if split_subdir else root
        classes = sorted(d for d in os.listdir(base)
                         if os.path.isdir(os.path.join(base, d)))
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(base, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(IMG_EXTENSIONS):
                    self.samples.append((os.path.join(cdir, fn),
                                         self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        path, label = self.samples[idx]
        return Image.open(path), label


class FileListDataset:
    """Flat file-list dataset (FFHQ / ImageFolder variants,
    `datasets/__init__.py:252-303`). Labels are 0 (unconditional)."""

    def __init__(self, root: str, file_list: Optional[str] = None):
        if file_list is not None:
            with open(file_list) as fp:
                names = [ln.strip() for ln in fp if ln.strip()]
            self.paths = [os.path.join(root, n) for n in names]
        else:
            self.paths = []
            for dirpath, _, files in sorted(os.walk(root)):
                for fn in sorted(files):
                    if fn.lower().endswith(IMG_EXTENSIONS):
                        self.paths.append(os.path.join(dirpath, fn))

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx):
        return Image.open(self.paths[idx]), 0


class CC3MDataset:
    """tsv of (image path, caption) pairs + text tokenizer
    (`datasets/__init__.py:115-175`)."""

    def __init__(self, root: str, tsv_name: str, tokenizer,
                 context_length: int = 64):
        self.root = root
        self.items: List[Tuple[str, str]] = []
        with open(os.path.join(root, tsv_name)) as fp:
            for ln in fp:
                parts = ln.rstrip('\n').split('\t')
                if len(parts) >= 2:
                    self.items.append((parts[0], parts[1]))
        self.tokenizer = tokenizer
        self.context_length = context_length

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        rel, text = self.items[idx]
        img = Image.open(os.path.join(self.root, rel))
        tokens = self.tokenizer.encode_padded(text, self.context_length)
        return img, np.asarray(tokens, np.int32)


class ConcatDataset:
    """CC15M = CC3M + CC12M (`datasets/__init__.py:191-249`)."""

    def __init__(self, datasets: Sequence[Any]):
        self.datasets = list(datasets)
        self.cum = np.cumsum([len(d) for d in self.datasets]).tolist()

    def __len__(self):
        return self.cum[-1]

    def __getitem__(self, idx):
        di = bisect.bisect_right(self.cum, idx)
        prev = 0 if di == 0 else self.cum[di - 1]
        return self.datasets[di][idx - prev]


@dataclass
class LoaderConfig:
    batch_size: int
    resolution: int = 256
    dataset_name: str = 'imagenet'
    train: bool = True
    seed: int = 0
    num_workers: int = 8
    drop_remainder: bool = True
    shard_index: int = 0
    shard_count: int = 1


class DataLoader:
    """Deterministic, shardable loader producing NHWC float32 [-1, 1]
    batches + labels. Per-item decode/augment fans out over a thread pool
    of `cfg.num_workers` (PIL decode releases the GIL); determinism is
    preserved because each item's augmentation RNG is keyed by (seed,
    dataset index), not by worker order."""

    def __init__(self, dataset, cfg: LoaderConfig):
        self.dataset = dataset
        self.cfg = cfg

    def _load_item(self, i: int):
        cfg = self.cfg
        img, label = self.dataset[int(i)]
        item_rng = np.random.RandomState(
            (cfg.seed * 1_000_003 + int(i)) % (2 ** 31))
        if cfg.train:
            arr = T.train_transform(img, cfg.resolution, item_rng,
                                    cfg.dataset_name)
        else:
            arr = T.valid_transform(img, cfg.resolution)
        return arr, label

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        cfg = self.cfg
        n = len(self.dataset)
        rng = np.random.RandomState(cfg.seed)
        order = rng.permutation(n) if cfg.train else np.arange(n)
        order = order[cfg.shard_index::cfg.shard_count]
        bs = cfg.batch_size
        steps = len(order) // bs if cfg.drop_remainder else \
            (len(order) + bs - 1) // bs
        pool = ThreadPoolExecutor(max(1, cfg.num_workers)) \
            if cfg.num_workers > 1 else None
        try:
            for s in range(steps):
                idxs = order[s * bs:(s + 1) * bs]
                if pool is not None:
                    items = list(pool.map(self._load_item, idxs))
                else:
                    items = [self._load_item(i) for i in idxs]
                imgs = [it[0] for it in items]
                labels = [it[1] for it in items]
                yield (np.stack(imgs),
                       np.stack(labels) if np.ndim(labels[0]) else
                       np.asarray(labels, np.int64))
        finally:
            if pool is not None:
                pool.shutdown(wait=False)

    def __len__(self):
        n = len(self.dataset) // self.cfg.shard_count
        return n // self.cfg.batch_size


def build_dataset(name: str, root: str, split: str = 'train',
                  tokenizer=None, context_length: int = 64):
    """Dataset dispatch (`datasets/__init__.py:76-107`)."""
    if name == 'imagenet':
        sub = 'train' if split == 'train' else 'val'
        return ImageFolderDataset(root, sub)
    if name in ('ffhq', 'imagefolder'):
        sub = os.path.join(root, split)
        return FileListDataset(sub if os.path.isdir(sub) else root)
    if name == 'cc3m':
        tsv = 'train_list.txt' if split == 'train' else 'val_list.txt'
        return CC3MDataset(root, tsv, tokenizer, context_length)
    if name == 'cc15m':
        tsv = 'train_list.txt' if split == 'train' else 'val_list.txt'
        cc3m = CC3MDataset(os.path.join(root, 'cc3m'), tsv, tokenizer,
                           context_length)
        if split != 'train':
            return cc3m
        cc12m = CC3MDataset(os.path.join(root, 'cc12m'), 'train_list.txt',
                            tokenizer, context_length)
        return ConcatDataset([cc3m, cc12m])
    raise ValueError(f'{name} is not a supported dataset')


class CC3MTextOnly:
    """Caption-only view of a CC3M tsv (`datasets/__init__.py:178-188`);
    yields (dummy image index, token ids)."""

    def __init__(self, root: str, tsv_name: str, tokenizer,
                 context_length: int = 64):
        self.captions: List[str] = []
        with open(os.path.join(root, tsv_name)) as fp:
            for ln in fp:
                parts = ln.rstrip('\n').split('\t')
                if len(parts) >= 2:
                    self.captions.append(parts[1])
        self.tokenizer = tokenizer
        self.context_length = context_length

    def __len__(self):
        return len(self.captions)

    def __getitem__(self, idx):
        tokens = self.tokenizer.encode_padded(self.captions[idx],
                                              self.context_length)
        return idx, np.asarray(tokens, np.int32)


class PrefetchLoader:
    """Wraps a DataLoader with a background producer thread so host-side
    batch assembly overlaps device steps (the reference leans on torch
    DataLoader workers, `main_stage1.py:72`). Per-item decode parallelism
    lives in DataLoader (`LoaderConfig.num_workers`); this wrapper only
    pipelines whole batches."""

    def __init__(self, loader, prefetch: int = 4):
        self.loader = loader
        self.prefetch = prefetch

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: 'queue.Queue' = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for item in self.loader:
                    q.put(item)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
