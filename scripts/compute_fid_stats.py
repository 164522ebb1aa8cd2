#!/usr/bin/env python
"""Build FID reference statistics (mu/sigma npz) from a dataset folder —
the self-hosted path the reference provides via
`hqvae/utils/fid_utils.py:123-228` (compute_activations_from_dataset).

    python scripts/compute_fid_stats.py -d imagenet --data-root /data \
        --split val --inception-weights pt_inception-2015-12-05.pth \
        -o stats/imagenet_256_val.npz [--max-samples 50000] [--save-acts]

The output npz is directly consumable by eval_hqmodel.py --ref-stat-path
(and, with --save-acts, --ref-feature-path for PRDC).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hqtransformer_tpu.data.datasets import build_dataset
from hqtransformer_tpu.evaluation.fid import (InceptionExtractor,
                                              compute_statistics_from_dataset,
                                              make_extractor)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('-d', '--dataset', type=str, default='imagenet')
    ap.add_argument('--data-root', type=str, required=True)
    ap.add_argument('--split', type=str, default='val')
    ap.add_argument('-o', '--out', type=str, required=True)
    ap.add_argument('--resolution', type=int, default=256)
    ap.add_argument('--max-samples', type=int, default=None)
    ap.add_argument('--batch-size', type=int, default=100)
    ap.add_argument('--save-acts', action='store_true',
                    help='also store per-image activations (for PRDC)')
    ap.add_argument('--inception-weights', type=str, default=None,
                    help='pt_inception-2015-12-05 torch file; REQUIRED for '
                         'real statistics (random init otherwise)')
    ap.add_argument('--feature-extractor', type=str, default='inception',
                    choices=['inception', 'pixels'],
                    help="'pixels' = weightless pixel-space features "
                         "(matching eval_hqmodel.py --feature-extractor)")
    args = ap.parse_args()

    if args.feature_extractor == 'inception' and not args.inception_weights:
        print('WARNING: no --inception-weights given; statistics use a '
              'randomly initialized Inception and are NOT comparable to '
              'published FID numbers (consider --feature-extractor pixels)',
              file=sys.stderr)

    dataset = build_dataset(args.dataset, args.data_root, args.split)
    extractor = make_extractor(args.feature_extractor,
                               weights_path=args.inception_weights,
                               batch_size=args.batch_size)
    compute_statistics_from_dataset(dataset, extractor, args.out,
                                    resolution=args.resolution,
                                    max_samples=args.max_samples,
                                    save_acts=args.save_acts)
    print(f'saved {args.out}')


if __name__ == '__main__':
    main()
