"""CPU-tier wrapper around scripts/demo_convergence.py — the local
counterpart of the reference's released-checkpoint FID validation
(`/root/reference/checkpoints/README.md:4-10`).

Skipped by default: the full-strength demo takes ~25 min on CPU on top of
an already-35-min suite. Run explicitly with

    HQT_RUN_SLOW=1 python -m pytest tests/test_convergence_demo.py -q

The shortened budget here (~8 min) uses a laxer ratio bound than the
committed full-strength numbers (FID 0.64 trained vs 29.3 random-init,
ratio ~45x, README "Does training work end-to-end?").
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get('HQT_RUN_SLOW') != '1',
                    reason='slow e2e demo; set HQT_RUN_SLOW=1 to run')
def test_training_beats_random_init(tmp_path):
    p = subprocess.run(
        [sys.executable, 'scripts/demo_convergence.py',
         '--workdir', str(tmp_path),
         '--stage1-steps', '150', '--stage2-steps', '200',
         '--n-samples', '64'],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu'})
    assert p.returncode == 0, f'{p.stdout[-3000:]}\n{p.stderr[-3000:]}'
    result = json.loads(p.stdout.strip().splitlines()[-1])
    assert result['fid_trained'] < result['fid_random'] / 3, result
