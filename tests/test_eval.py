"""Evaluation stack tests: PRDC vs the torch reference, Frechet distance
sanity + reference formula parity, FID-Inception shapes, inception score.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hqtransformer_tpu.evaluation.fid import (frechet_distance,
                                              inception_score,
                                              mean_covar_numpy)
from hqtransformer_tpu.evaluation.inception import FIDInceptionV3
from hqtransformer_tpu.evaluation.prdc import compute_prdc


def test_prdc_matches_reference():
    torch = pytest.importorskip('torch')
    from reference_loader import ref_module
    ref_prdc = ref_module('hqvae.utils.prdc')

    rng = np.random.RandomState(0)
    real = rng.randn(200, 16).astype(np.float32)
    fake = rng.randn(180, 16).astype(np.float32) * 1.1 + 0.1

    t = ref_prdc.compute_prdc(real, fake, nearest_k=3)
    j = compute_prdc(real, fake, nearest_k=3)
    for k in ('precision', 'recall', 'density', 'coverage'):
        np.testing.assert_allclose(j[k], t[k], atol=1e-5, err_msg=k)


def test_frechet_distance_matches_reference():
    torch = pytest.importorskip('torch')
    from reference_loader import ref_module
    # fid_utils imports torchvision + `datasets`; stub both
    import sys, types
    for mod in ('torchvision', 'torchvision.transforms'):
        sys.modules.setdefault(mod, types.ModuleType(mod))
    sys.modules['torchvision'].transforms = sys.modules[
        'torchvision.transforms']
    ds_stub = types.ModuleType('datasets')
    ds_stub.ImageNet = object
    sys.modules.setdefault('datasets', ds_stub)
    inception_stub = types.ModuleType('hqvae.utils.inception')
    class _I:  # noqa: N801
        BLOCK_INDEX_BY_DIM = {2048: 3}
        def __init__(self, *a, **k):
            pass
    inception_stub.InceptionV3 = _I
    sys.modules['hqvae.utils.inception'] = inception_stub
    ref_fid = ref_module('hqvae.utils.fid_utils')

    rng = np.random.RandomState(1)
    a = rng.randn(500, 8).astype(np.float64)
    b = rng.randn(400, 8).astype(np.float64) + 0.3
    mu1, s1 = mean_covar_numpy(a)
    mu2, s2 = mean_covar_numpy(b)
    ref_val = ref_fid.frechet_distance(mu1, s1, mu2, s2)
    my_val = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(my_val, ref_val, rtol=1e-8)
    # identical distributions -> ~0
    assert abs(frechet_distance(mu1, s1, mu1, s1)) < 1e-6


def test_fid_inception_shapes():
    model = FIDInceptionV3()
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, return_logits=True)
    feats, logits = model.apply(variables, x, return_logits=True)
    assert feats.shape == (2, 2048)
    assert logits.shape == (2, 1008)
    n_params = sum(p.size for p in jax.tree.leaves(variables['params']))
    # FID inception-v3 has ~23.9M params (incl. 1008-way fc)
    assert 23e6 < n_params < 26e6, n_params


def test_inception_score_uniform_is_one():
    logits = np.zeros((100, 10), np.float32)
    assert abs(inception_score(logits, splits=5) - 1.0) < 1e-5


def test_dataset_stats_builder(tmp_path):
    """Self-hosted FID reference statistics from a dataset folder
    (`fid_utils.py:123-228` equivalent) with random-init inception."""
    from PIL import Image
    from hqtransformer_tpu.data.datasets import build_dataset
    from hqtransformer_tpu.evaluation.fid import (
        InceptionExtractor, compute_statistics_from_dataset,
        frechet_distance)

    root = tmp_path / 'imgs'
    root.mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        Image.fromarray(rng.randint(0, 255, (40, 48, 3), np.uint8)).save(
            root / f'im_{i}.png')

    ds = build_dataset('imagefolder', str(tmp_path))
    extractor = InceptionExtractor(batch_size=3)
    out = tmp_path / 'stats.npz'
    compute_statistics_from_dataset(ds, extractor, str(out), resolution=32,
                                    max_samples=5, save_acts=True)
    stats = np.load(out)
    assert stats['mu'].shape == (2048,)
    assert stats['sigma'].shape == (2048, 2048)
    assert stats['acts'].shape == (5, 2048)
    assert np.isfinite(stats['mu']).all()
    # identical stats => FID 0
    fid = frechet_distance(stats['mu'], stats['sigma'],
                           stats['mu'], stats['sigma'])
    assert abs(fid) < 1e-3
