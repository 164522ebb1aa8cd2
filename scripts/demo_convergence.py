#!/usr/bin/env python
"""End-to-end training-convergence demonstration through the REAL CLIs:
train a tiny stage-1 then a tiny stage-2 from scratch on a synthetic
color-structured dataset, sample from the trained model and from a
random-init model, and show FID(trained) << FID(random-init) against the
training set's own statistics.

This is the local counterpart of the reference's ultimate validation — its
released checkpoints and FID table (`/root/reference/checkpoints/README.md:
4-10`): the pipeline (main_stage1.py -> main_stage2.py ->
sampling_hqmodel.py -> compute_fid_stats.py -> eval_hqmodel.py) is exactly
the user-facing path; only the dataset and model are shrunk so the whole
demonstration runs in minutes on CPU. Without --inception-weights the
Frechet distance is computed in pixel space (--feature-extractor pixels;
a RANDOM-init Inception collapses to near-constant features and cannot
rank distributions — see evaluation.fid.PixelExtractor).

    python scripts/demo_convergence.py --workdir /tmp/conv_demo

Prints one JSON line: {"fid_trained": ..., "fid_random": ..., "ratio": ...}
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, 'configs', 'tiny', 'convergence-tiny.yaml')


def run(argv, timeout=3600):
    env = dict(os.environ)
    env.setdefault('JAX_PLATFORMS', 'cpu')
    p = subprocess.run([sys.executable] + argv, cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=timeout)
    if p.returncode != 0:
        raise RuntimeError(f'{argv[:2]} failed:\n{p.stdout[-3000:]}\n'
                           f'{p.stderr[-3000:]}')
    return p


def make_dataset(root: str, n_classes: int = 10, per_class: int = 48,
                 res: int = 32, seed: int = 0):
    """Synthetic learnable dataset: each class is a distinct base color;
    images add a smooth random two-corner gradient and light noise. A tiny
    VQ-VAE reconstructs these easily and a tiny AR prior can learn the
    class -> palette mapping."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    hues = np.linspace(0.0, 1.0, n_classes, endpoint=False)

    def hsv_to_rgb(h, s, v):
        i = int(h * 6) % 6
        f = h * 6 - int(h * 6)
        p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
        return [(v, t, p), (q, v, p), (p, v, t),
                (p, q, v), (t, p, v), (v, p, q)][i]

    yy, xx = np.meshgrid(np.linspace(0, 1, res), np.linspace(0, 1, res),
                         indexing='ij')
    for split, n in [('train', per_class), ('val', max(4, per_class // 8))]:
        for c in range(n_classes):
            d = os.path.join(root, split, f'class_{c:02d}')
            os.makedirs(d, exist_ok=True)
            base = np.asarray(hsv_to_rgb(hues[c], 0.85, 0.9))
            for i in range(n):
                a, b = rng.uniform(-0.25, 0.25, 2)
                grad = (a * yy + b * xx)[..., None]
                img = base[None, None, :] + grad
                img = img + rng.normal(0, 0.02, img.shape)
                arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f'{i:03d}.png'))


def latest_subdir(path):
    subs = sorted(os.listdir(path))
    return os.path.join(path, subs[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', type=str, default='/tmp/conv_demo')
    ap.add_argument('--stage1-steps', type=int, default=400)
    ap.add_argument('--stage2-steps', type=int, default=600)
    ap.add_argument('--n-samples', type=int, default=100)
    ap.add_argument('--inception-weights', type=str, default=None)
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    data = os.path.join(wd, 'data')
    if not os.path.isdir(os.path.join(data, 'train')):
        print('[1/6] building synthetic dataset..', flush=True)
        make_dataset(data)

    print('[2/6] training stage-1 (main_stage1.py)..', flush=True)
    run(['main_stage1.py', '-c', CFG, '-r', os.path.join(wd, 's1'),
         '--data-root', data, '--max-steps', str(args.stage1_steps)])
    s1_ckpt = os.path.join(latest_subdir(
        os.path.join(wd, 's1', 'convergence-tiny')), 'ckpt')

    print('[3/6] training stage-2 (main_stage2.py)..', flush=True)
    run(['main_stage2.py', '-c', CFG, '-r', os.path.join(wd, 's2'),
         '--data-root', data, '--stage1-ckpt', s1_ckpt,
         '--max-steps', str(args.stage2_steps)])
    full_ckpt = os.path.join(latest_subdir(
        os.path.join(wd, 's2', 'convergence-tiny')), 'ckpt_full')

    print('[4/6] sampling trained + random-init (sampling_hqmodel.py)..',
          flush=True)
    ns, bs = args.n_samples, 50
    common = ['-c', CFG, '--num-classes', '10', '--top-k', '64',
              '--temperature', '1.0', '--batch-size', str(bs),
              '--total-samples', str(ns), '--dtype', 'float32']
    run(['sampling_hqmodel.py', '-m', full_ckpt,
         '-r', os.path.join(wd, 'samples_trained')] + common)
    run(['sampling_hqmodel.py', '--random-init',
         '-r', os.path.join(wd, 'samples_random')] + common)

    print('[5/6] training-set statistics (compute_fid_stats.py)..',
          flush=True)
    stats = os.path.join(wd, 'train_stats.npz')
    feat = 'inception' if args.inception_weights else 'pixels'
    cmd = ['scripts/compute_fid_stats.py', '--data-root', data,
           '--split', 'train', '--resolution', '32', '-o', stats,
           '--batch-size', '50', '--feature-extractor', feat]
    if args.inception_weights:
        cmd += ['--inception-weights', args.inception_weights]
    run(cmd)

    print('[6/6] FID (eval_hqmodel.py)..', flush=True)
    fids = {}
    for name in ('trained', 'random'):
        cmd = ['eval_hqmodel.py', '-r', os.path.join(wd, f'samples_{name}'),
               '--metrics', 'fid', '--ref-stat-path', stats,
               '--feature-extractor', feat]
        if args.inception_weights:
            cmd += ['--inception-weights', args.inception_weights]
        p = run(cmd)
        line = [ln for ln in p.stdout.strip().splitlines() if 'fid' in ln][-1]
        import ast
        fids[name] = float(ast.literal_eval(line)['fid'])

    out = {'fid_trained': round(fids['trained'], 3),
           'fid_random': round(fids['random'], 3),
           'ratio': round(fids['random'] / max(fids['trained'], 1e-9), 3)}
    print(json.dumps(out))
    if fids['trained'] >= fids['random']:
        print('WARNING: training did not improve FID', file=sys.stderr)
        sys.exit(1)


if __name__ == '__main__':
    main()
