"""Serving-scale artifact round-trip (save_serving_scales /
load_serving_scales): the calibration collections survive the file
boundary bit-exactly, and params are untouched. This is the process split
the int8 family rows rely on (bench_family.py two-process PTQ flow;
measure_throughput.py scales_out/scales_in).
"""

import numpy as np

import jax
import jax.numpy as jnp

from hqtransformer_tpu.models.twostage import (load_serving_scales,
                                               save_serving_scales)


def _variables():
    return {
        'stage1': {
            'params': {'w': jnp.ones((4, 4), jnp.bfloat16)},
            'act_scales': {'conv_0': jnp.asarray([0.5, 0.25], jnp.float32)},
        },
        'stage2': {
            'params': {'w': jnp.zeros((2, 2), jnp.bfloat16)},
            'kv_scales': {'blocks_0': {'attn': {
                'k': jnp.asarray([1e-3, 2e-3], jnp.float32),
                'v': jnp.asarray([3e-3, 4e-3], jnp.float32)}}},
            'act_scales': {'dense_0': jnp.asarray([0.125], jnp.float32)},
        },
    }


def test_serving_scales_roundtrip(tmp_path):
    v = _variables()
    path = str(tmp_path / 'scales.pkl')
    save_serving_scales(v, path)

    # a fresh process would hold params only — strip the collections
    stripped = {s: {'params': v[s]['params']} for s in ('stage1', 'stage2')}
    out = load_serving_scales(stripped, path)

    for stage, coll in (('stage1', 'act_scales'), ('stage2', 'kv_scales'),
                        ('stage2', 'act_scales')):
        want = jax.tree.leaves(v[stage][coll])
        got = jax.tree.leaves(out[stage][coll])
        assert len(want) == len(got)
        for a, b in zip(want, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params untouched (same object)
    assert out['stage1']['params'] is stripped['stage1']['params']


def test_serving_scales_partial_collections(tmp_path):
    # serving=int8 (no stage-2 gemm scales): only the present collections
    # are saved, and loading never invents the absent ones
    v = _variables()
    del v['stage2']['act_scales']
    path = str(tmp_path / 'scales.pkl')
    save_serving_scales(v, path)
    out = load_serving_scales(
        {s: {'params': v[s]['params']} for s in ('stage1', 'stage2')}, path)
    assert 'act_scales' not in out['stage2']
    assert 'kv_scales' in out['stage2']
    assert 'act_scales' in out['stage1']
