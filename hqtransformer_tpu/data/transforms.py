"""Image transforms mirroring the reference's torchvision pipelines
(`hqvae/datasets/__init__.py:49-74`) in PIL + numpy: train = Resize(shorter
side) + RandomCrop (+ RandomResizedCrop/HFlip for FFHQ), valid = Resize +
CenterCrop, both -> [-1, 1] float32 NHWC.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def resize_shorter(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if w < h:
        nw, nh = size, max(1, round(h * size / w))
    else:
        nw, nh = max(1, round(w * size / h)), size
    return img.resize((nw, nh), Image.BICUBIC)


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def random_crop(img: Image.Image, size: int, rng: np.random.RandomState
                ) -> Image.Image:
    w, h = img.size
    left = rng.randint(0, max(1, w - size + 1))
    top = rng.randint(0, max(1, h - size + 1))
    return img.crop((left, top, left + size, top + size))


def random_resized_crop(img: Image.Image, size: int,
                        rng: np.random.RandomState,
                        scale=(0.75, 1.0), ratio=(1.0, 1.3333)
                        ) -> Image.Image:
    """torchvision RandomResizedCrop semantics (FFHQ train transform,
    `datasets/__init__.py:52-56`)."""
    w, h = img.size
    area = w * h
    for _ in range(10):
        target = area * rng.uniform(*scale)
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        ar = np.exp(log_r)
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            left = rng.randint(0, w - cw + 1)
            top = rng.randint(0, h - ch + 1)
            return img.crop((left, top, left + cw, top + ch)).resize(
                (size, size), Image.BICUBIC)
    return center_crop(resize_shorter(img, size), size)


def to_normalized_array(img: Image.Image) -> np.ndarray:
    """uint8 RGB -> float32 [-1, 1] HWC (Normalize(0.5, 0.5))."""
    arr = np.asarray(img.convert('RGB'), np.float32) / 255.0
    return arr * 2.0 - 1.0


def train_transform(img: Image.Image, resolution: int,
                    rng: np.random.RandomState,
                    dataset: str = 'imagenet') -> np.ndarray:
    if dataset in ('ffhq',):
        img = random_resized_crop(img, resolution, rng)
        if rng.rand() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
    else:
        img = resize_shorter(img, resolution)
        img = random_crop(img, resolution, rng)
    return to_normalized_array(img)


def valid_transform(img: Image.Image, resolution: int) -> np.ndarray:
    img = resize_shorter(img, resolution)
    img = center_crop(img, resolution)
    return to_normalized_array(img)
