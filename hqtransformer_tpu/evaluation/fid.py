"""FID utilities: Inception activation extraction from sample files,
mean/covariance statistics, Frechet distance.

Mirrors `hqvae/utils/fid_utils.py` (the pytorch-fid port): the sample files
are the pickled [B, 3, H, W] float arrays in [0, 1] produced by
`sampling_hqmodel*.py`; statistics are compared against precomputed dataset
npz files (mu/sigma). The Inception forward is jitted and batched on the
accelerator; sqrtm stays on host scipy (`fid_utils.py:66-120`).
"""

from __future__ import annotations

import glob
import logging
import os
import pickle
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from .inception import FIDInceptionV3, load_torch_fid_inception


def mean_covar_numpy(xs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(`fid_utils.py:60-63`)"""
    return np.mean(xs, axis=0), np.cov(xs, rowvar=False)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Stable Frechet distance (`fid_utils.py:66-120`)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape, (
        f'feature-dimension mismatch {mu1.shape} vs {mu2.shape}: candidate '
        f'and reference statistics must come from the same feature extractor')
    assert sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        logging.warning('fid calculation produces singular product; '
                        'adding %s to diagonal of cov estimates', eps)
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError('Imaginary component '
                             f'{np.max(np.abs(covmean.imag))}')
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) -
                 2 * np.trace(covmean))


class InceptionExtractor:
    """Jitted batched 2048-d feature (and logits) extractor."""

    def __init__(self, weights_path: Optional[str] = None,
                 batch_size: int = 100):
        self.model = FIDInceptionV3()
        self.batch_size = batch_size
        x = jnp.zeros((1, 64, 64, 3))
        self.variables = self.model.init(jax.random.PRNGKey(0), x,
                                         return_logits=True)
        if weights_path:
            import torch
            sd = torch.load(weights_path, map_location='cpu')
            self.variables = load_torch_fid_inception(self.variables, sd)
        self._feats_fn = jax.jit(
            lambda v, x: self.model.apply(v, x))
        self._logits_fn = jax.jit(
            lambda v, x: self.model.apply(v, x, return_logits=True))

    def features(self, images01_nhwc: np.ndarray) -> np.ndarray:
        """images: [N, H, W, 3] float in [0, 1] -> [N, 2048]."""
        outs = []
        bs = self.batch_size
        n = images01_nhwc.shape[0]
        for i in range(0, n, bs):
            chunk = images01_nhwc[i:i + bs]
            if chunk.shape[0] < bs:  # pad to static shape
                pad = bs - chunk.shape[0]
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:],
                                     chunk.dtype)], 0)
                outs.append(np.asarray(
                    self._feats_fn(self.variables, jnp.asarray(chunk))
                )[:bs - pad])
            else:
                outs.append(np.asarray(
                    self._feats_fn(self.variables, jnp.asarray(chunk))))
        return np.concatenate(outs, axis=0)

    def logits(self, images01_nhwc: np.ndarray) -> np.ndarray:
        outs = []
        bs = self.batch_size
        for i in range(0, images01_nhwc.shape[0], bs):
            chunk = images01_nhwc[i:i + bs]
            _, lg = self._logits_fn(self.variables, jnp.asarray(chunk))
            outs.append(np.asarray(lg))
        return np.concatenate(outs, axis=0)


class PixelExtractor:
    """Weightless fallback feature extractor: average-pooled pixels
    ([grid, grid, 3] -> flat), giving a pixel-space Frechet distance.

    A RANDOM-init Inception is useless for FID (its deep stack collapses
    to near-constant 2048-d features, measured per-dim std ~1e-5), so in
    environments without the pt_inception weights this provides a feature
    space in which distribution distances still order correctly (color +
    coarse structure). NOT comparable to published FID numbers.
    """

    def __init__(self, grid: int = 8, batch_size: int = 100):
        self.grid = grid
        self.batch_size = batch_size

    def features(self, images01_nhwc: np.ndarray) -> np.ndarray:
        x = np.asarray(images01_nhwc, np.float32)
        n, h, w, c = x.shape
        g = min(self.grid, h, w)
        hb, wb = h // g, w // g
        x = x[:, :hb * g, :wb * g]
        x = x.reshape(n, g, hb, g, wb, c).mean(axis=(2, 4))
        return x.reshape(n, -1)


def make_extractor(kind: str = 'inception', weights_path=None,
                   batch_size: int = 100):
    """'inception' (weights_path for real FID) or 'pixels' (weightless)."""
    if kind == 'pixels':
        return PixelExtractor(batch_size=batch_size)
    assert kind == 'inception', kind
    return InceptionExtractor(weights_path=weights_path,
                              batch_size=batch_size)


def iter_sample_files(result_path: str) -> Iterable[np.ndarray]:
    """Yield [B, H, W, 3] float batches in [0, 1] from the pickled sample
    files written by sampling_hqmodel*.py (`fid_utils.py:231-296`)."""
    files = sorted(glob.glob(os.path.join(result_path, 'samples_*.pkl')))
    if not files:
        raise FileNotFoundError(f'no samples_*.pkl under {result_path}')
    for f in files:
        with open(f, 'rb') as fp:
            arr = pickle.load(fp)
        arr = np.asarray(arr, np.float32)
        if arr.ndim == 4 and arr.shape[1] == 3:  # NCHW -> NHWC
            arr = arr.transpose(0, 2, 3, 1)
        yield arr


def compute_activations_from_files(result_path: str,
                                   extractor: InceptionExtractor,
                                   max_samples: Optional[int] = None
                                   ) -> np.ndarray:
    """Inception activations for every sample batch in a result dir."""
    acts = []
    n = 0
    for batch in iter_sample_files(result_path):
        acts.append(extractor.features(batch))
        n += batch.shape[0]
        if max_samples and n >= max_samples:
            break
    acts = np.concatenate(acts, axis=0)
    return acts[:max_samples] if max_samples else acts


def compute_activations_from_dataset(dataset, extractor: InceptionExtractor,
                                     resolution: int = 256,
                                     max_samples: Optional[int] = None,
                                     dataset_name: str = 'imagenet'
                                     ) -> np.ndarray:
    """Inception activations over a dataset (center-crop eval transform),
    the self-hosted reference-statistics path
    (`hqvae/utils/fid_utils.py:123-228` compute_activations_from_dataset).

    `dataset`: any indexable yielding (PIL image, label) — e.g.
    `data.datasets.build_dataset(...)` output."""
    from ..data import transforms as T

    n = len(dataset) if max_samples is None else min(len(dataset),
                                                     max_samples)
    acts = []
    bs = extractor.batch_size
    for start in range(0, n, bs):
        imgs = []
        for i in range(start, min(start + bs, n)):
            img, _ = dataset[i]
            arr = T.valid_transform(img, resolution)   # [-1, 1] NHWC
            imgs.append(arr * 0.5 + 0.5)               # -> [0, 1]
        acts.append(extractor.features(np.stack(imgs).astype(np.float32)))
    return np.concatenate(acts, axis=0)


def compute_statistics_from_dataset(dataset, extractor: InceptionExtractor,
                                    out_path: str,
                                    resolution: int = 256,
                                    max_samples: Optional[int] = None,
                                    save_acts: bool = False) -> dict:
    """Build a reference-statistics npz (mu/sigma[, acts]) from a dataset —
    makes the FID pipeline self-hosted on new datasets instead of requiring
    a precomputed `ref_stat_path` (`fid_utils.py:123-228`)."""
    acts = compute_activations_from_dataset(dataset, extractor, resolution,
                                            max_samples)
    mu, sigma = mean_covar_numpy(acts)
    payload = {'mu': mu, 'sigma': sigma}
    if save_acts:
        payload['acts'] = acts
    np.savez(out_path, **payload)
    logging.info('inception statistics (%d samples) saved to %s',
                 acts.shape[0], out_path)
    return payload


def inception_score(logits: np.ndarray, splits: int = 10) -> float:
    """IS from inception logits (softmax over the 1008 classes)."""
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    scores = []
    n = probs.shape[0]
    for i in range(splits):
        part = probs[i * n // splits:(i + 1) * n // splits]
        py = part.mean(axis=0, keepdims=True)
        kl = (part * (np.log(part + 1e-12) - np.log(py + 1e-12))).sum(-1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores))
