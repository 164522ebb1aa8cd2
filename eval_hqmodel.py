#!/usr/bin/env python
"""Generation eval: FID vs precomputed dataset Inception statistics and PRDC
vs reference features — the `eval_hqmodel.py` surface of the reference
(`/root/reference/eval_hqmodel.py:14-147`).

Consumes the sample dirs written by `sampling_hqmodel*.py` (pickled pixel
batches); caches activations to `<result>/acts.npz` with the same keys
(acts/mu/sigma) so stats interchange with the reference pipeline.

The FID-Inception weights are passed via --inception-weights (the public
pt_inception-2015-12-05 file; the reference hardcodes a private path,
`hqvae/utils/inception.py:22`).
"""

import argparse
import logging
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from hqtransformer_tpu.evaluation.fid import (InceptionExtractor,
                                              compute_activations_from_files,
                                              frechet_distance,
                                              make_extractor,
                                              mean_covar_numpy)
from hqtransformer_tpu.evaluation.prdc import compute_prdc

DATASET_STATS_FOR_FID = {
    'imagenet': 'assets/inception_stats/imagenet_256_train.npz',
    'ffhq': 'assets/inception_stats/ffhq_256_train.npz',
    'cc3m': 'assets/inception_stats/cc3m_256_val.npz',
}

DATASET_ACTS_FOR_PRDC = {
    'imagenet': 'assets/inception_features/adm/imagenet_256_10000.npz',
    'ffhq': 'assets/inception_features/shuffled/ffhq_256_train_50000.npz',
}


def compute_fid_prdc(result_path, ref_stat_path=None, ref_feature_path=None,
                     inception_weights=None, max_samples=None,
                     feature_extractor='inception'):
    """(`eval_hqmodel.py:14-68`)"""
    suffix = '' if feature_extractor == 'inception' else \
        f'_{feature_extractor}'
    act_path = Path(result_path) / f'acts{suffix}.npz'
    if not act_path.exists():
        extractor = make_extractor(feature_extractor,
                                   weights_path=inception_weights)
        acts = compute_activations_from_files(result_path, extractor,
                                              max_samples=max_samples)
        mu, sigma = mean_covar_numpy(acts)
        np.savez(act_path, acts=acts, mu=mu, sigma=sigma)
        logging.info('activations saved to %s', act_path.as_posix())
    else:
        logging.info('precomputed activations found: %s',
                     act_path.as_posix())

    acts_fake = np.load(act_path)
    metrics = {}
    if ref_stat_path:
        stats_ref = np.load(ref_stat_path)
        fid = frechet_distance(stats_ref['mu'], stats_ref['sigma'],
                               acts_fake['mu'], acts_fake['sigma'])
        metrics['fid'] = fid
        logging.info('FID: %.4f', fid)
    if ref_feature_path:
        ref_features = np.load(ref_feature_path)['acts']
        prdc = compute_prdc(ref_features, acts_fake['acts'], nearest_k=3)
        logging.info('P=%.4f, R=%.4f, D=%.4f, C=%.4f', prdc['precision'],
                     prdc['recall'], prdc['density'], prdc['coverage'])
        metrics.update(prdc)
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('-r', '--result-path', type=str, required=True)
    ap.add_argument('-d', '--ref-dataset', type=str, default='imagenet')
    ap.add_argument('-m', '--metrics', nargs='+', default=['fid', 'prdc'])
    ap.add_argument('--ref-stat-path', type=str, default=None)
    ap.add_argument('--ref-feature-path', type=str, default=None)
    ap.add_argument('--assets-root', type=str, default='assets')
    ap.add_argument('--inception-weights', type=str,
                    default=os.environ.get('FID_INCEPTION_WEIGHTS'))
    ap.add_argument('--max-samples', type=int, default=None)
    ap.add_argument('--feature-extractor', type=str, default='inception',
                    choices=['inception', 'pixels'],
                    help="'pixels' = weightless pixel-space Frechet "
                         "distance (random-init Inception features "
                         "collapse; see evaluation.fid.PixelExtractor)")
    args = ap.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(os.path.join(args.result_path,
                                                   'fid_prdc.log'))])

    # the bundled dataset fallbacks are INCEPTION statistics/features; with
    # --feature-extractor pixels they would silently mix 2048-d reference
    # moments with pixel-space candidate moments — require explicit paths
    # (built with the same extractor via scripts/compute_fid_stats.py)
    ref_stat = args.ref_stat_path
    if (ref_stat is None and 'fid' in args.metrics
            and args.feature_extractor == 'inception'):
        cand = DATASET_STATS_FOR_FID.get(args.ref_dataset, '')
        ref_stat = cand if os.path.exists(cand) else None
    ref_feats = args.ref_feature_path
    if (ref_feats is None and 'prdc' in args.metrics
            and args.feature_extractor == 'inception'):
        cand = DATASET_ACTS_FOR_PRDC.get(args.ref_dataset, '')
        ref_feats = cand if os.path.exists(cand) else None

    metrics = compute_fid_prdc(args.result_path, ref_stat, ref_feats,
                               args.inception_weights, args.max_samples,
                               feature_extractor=args.feature_extractor)
    print({k: round(float(v), 4) for k, v in metrics.items()})


if __name__ == '__main__':
    main()
