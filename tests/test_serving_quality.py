"""Distribution-level quality of the serving modes vs the parity-tested
float path (scripts/serving_quality_delta.py): packed-bf16 sampling, the
int8 KV cache, and the int8 stage-1 decode must all be distribution-
equivalent on a REAL trained model — the end statement on top of the
per-step bounds in tests/test_bf16_divergence.py.

Skipped by default (trains the convergence-demo tiny model, ~15 min on
CPU): HQT_RUN_SLOW=1 python -m pytest tests/test_serving_quality.py -q

Committed full-strength numbers live in docs/serving.md. Numerics stance
mirrors the reference's fp16-autocast sampling vs its fp32 forward
(`hqvae/models/stage2/hierarchical_ar.py:445`).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get('HQT_RUN_SLOW') != '1',
                    reason='slow e2e demo; set HQT_RUN_SLOW=1 to run')
def test_serving_modes_are_distribution_equivalent(tmp_path):
    p = subprocess.run(
        [sys.executable, 'scripts/serving_quality_delta.py',
         '--workdir', str(tmp_path),
         '--stage1-steps', '150', '--stage2-steps', '200',
         '--n-samples', '100', '--batch-size', '50'],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu'})
    assert p.returncode == 0, f'{p.stdout[-3000:]}\n{p.stderr[-3000:]}'
    r = json.loads(p.stdout.strip().splitlines()[-1])
    base = r['fid_proxy_base']
    # loose bounds (the shortened training budget is noisier than the
    # committed full-strength numbers): every serving mode must land within
    # 5% of the float path's distance-to-train, and its direct distance to
    # the float path's samples must be well under that distance.
    for mode in ('packed_bf16', 'int8_kv', 'int8_decode', 'int8_stage2',
                 'int8_spatial', 'int8_full', 'int8_max'):
        assert abs(r[f'fid_proxy_{mode}'] - base) < 0.05 * base + 0.5, r
        assert r[f'frechet_to_base_{mode}'] < 0.1 * base + 0.5, r
