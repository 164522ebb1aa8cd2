"""End-to-end L0 pipeline smoke: tiny random model -> sampling_hqmodel.py
artifacts -> eval_hqmodel.py FID/PRDC, all through the real CLI entry
points in subprocesses (the reference's de-facto acceptance path,
`/root/reference/sampling_hqmodel.py` + `/root/reference/eval_hqmodel.py:14-68`).

Inception runs with random init (weights are external assets); the samples'
own activations serve as the reference statistics, so FID vs itself must be
~0 and PRDC precision/recall must be 1.
"""

import ast
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY_CFG = os.path.join(REPO, 'configs', 'tiny', 'stage2-tiny.yaml')


def _run(argv, timeout=900):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    proc = subprocess.run([sys.executable] + argv, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f'{argv[0]} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}')
    return proc


def test_sampling_then_eval_pipeline(tmp_path):
    sample_dir = tmp_path / 'samples'
    _run(['sampling_hqmodel.py', '--random-init', '-c', TINY_CFG,
          '-r', str(sample_dir), '--num-classes', '2', '--total-samples',
          '8', '--batch-size', '4', '--top-k', '64', '--dtype', 'float32'])

    pkls = sorted(sample_dir.glob('samples_*.pkl'))
    npzs = sorted(sample_dir.glob('targets_*.npz'))
    assert len(pkls) == 2 and len(npzs) == 2
    import pickle
    arr = pickle.loads(pkls[0].read_bytes())
    assert arr.shape == (4, 3, 32, 32)                # NCHW, ref layout
    assert 0.0 <= arr.min() and arr.max() <= 1.0
    assert np.load(npzs[0])['targets'].shape == (4,)

    # first eval pass computes + caches acts.npz (random-init inception)
    _run(['eval_hqmodel.py', '-r', str(sample_dir)])
    acts = np.load(sample_dir / 'acts.npz')
    assert acts['acts'].shape == (8, 2048)
    assert np.isfinite(acts['acts']).all()
    assert acts['mu'].shape == (2048,)

    # second pass: FID/PRDC of the samples against THEMSELVES
    proc = _run(['eval_hqmodel.py', '-r', str(sample_dir),
                 '--ref-stat-path', str(sample_dir / 'acts.npz'),
                 '--ref-feature-path', str(sample_dir / 'acts.npz')])
    metrics = ast.literal_eval(proc.stdout.strip().splitlines()[-1])
    assert abs(metrics['fid']) < 1e-3
    assert metrics['precision'] == 1.0
    assert metrics['recall'] == 1.0
    for v in metrics.values():
        assert np.isfinite(v)
