#!/usr/bin/env python
"""Quantify the bf16 packed-kernel vs einsum sampling divergence.

The packed Pallas decode-attention kernel rounds q*k products to bf16
before the f32 head-sum; the XLA einsum path accumulates unrounded (see
ops/pallas_attention.py docstring). In f32 both paths emit IDENTICAL
streams (tested); in bf16 ulp-level differences cascade through the AR
chain. This measures that divergence on the flagship shapes — evidence
for the "within rounding, same class as the reference's fp16 autocast"
claim (`/root/reference/hqvae/models/stage2/hierarchical_ar.py:445`):

  * greedy streams (temperature ~0, deterministic): agreement isolates
    argmax flips caused purely by rounding-level logit shifts;
  * sampled streams at the benchmark knobs (top-k 2048, T 0.95): raw
    agreement, plus the step of FIRST divergence per sample — once one
    token differs the chains legitimately diverge (different context), so
    first-divergence depth, not total agreement, is the numerics signal;
  * mean / max |logit delta| of the two paths' FIRST spatial step (same
    context by construction).

Usage: python scripts/measure_bf16_divergence.py [--batch 64] [--seeds 4]
On CPU set HQT_PACKED_INTERPRET=1 to run the real kernel in interpret mode
(tests/test_bf16_divergence.py asserts bounds on a tiny model this way).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp
import numpy as np

from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.twostage import (TwoStageModel,
                                               serving_bf16_params)
from hqtransformer_tpu.sampling.engine import (SamplingParams,
                                               make_hierarchical_sampler)

CONFIG = os.environ.get('BENCH_CONFIG', os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', 'configs', 'imagenet',
    'stage2', 'hqtransformer-l12-top8x8.yaml'))


def first_divergence_steps(a, b):
    """Per-sample index of the first differing spatial step (or n_steps)."""
    diff = np.asarray(a != b)
    if diff.ndim == 3:
        diff = diff.any(-1)
    n = diff.shape[1]
    first = np.where(diff.any(1), diff.argmax(1), n)
    return first


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--seeds', type=int, default=4)
    ap.add_argument('--config', type=str, default=CONFIG)
    args = ap.parse_args()

    cfg = build_twostage_config(args.config)
    model = TwoStageModel(cfg, dtype=jnp.bfloat16)
    variables = model.init_variables(jax.random.PRNGKey(0))
    variables = serving_bf16_params(variables)
    v2 = variables['stage2']
    m = model.stage2
    labels = jnp.arange(args.batch, dtype=jnp.int32) % 1000

    sp_bench = SamplingParams(top_k_top=2048, top_k_bot=2048,
                              temperature_top=0.95, temperature_bot=0.95)
    sp_greedy = SamplingParams(temperature_top=1e-6, temperature_bot=1e-6)

    for name, sp in [('greedy', sp_greedy), ('bench-knobs', sp_bench)]:
        agree_t, agree_b, firsts = [], [], []
        for seed in range(args.seeds):
            key = jax.random.PRNGKey(seed)
            outs = {}
            for attn in ('packed', 'einsum'):
                s = make_hierarchical_sampler(m, params=sp,
                                              cache_dtype=jnp.bfloat16,
                                              n_segments=4, attention=attn)
                ct, cb = s(v2, key, labels)
                outs[attn] = (np.asarray(ct), np.asarray(cb))
            (ct_p, cb_p), (ct_e, cb_e) = outs['packed'], outs['einsum']
            agree_t.append((ct_p == ct_e).mean())
            agree_b.append((cb_p == cb_e).mean())
            firsts.append(first_divergence_steps(ct_p, ct_e))
        firsts = np.concatenate(firsts)
        n_steps = outs['packed'][0].shape[1]
        print(f'[{name}] top agreement {np.mean(agree_t):.4f}  '
              f'bottom agreement {np.mean(agree_b):.4f}  '
              f'first-divergence step: median '
              f'{np.median(firsts):.0f}/{n_steps} '
              f'mean {firsts.mean():.1f}  '
              f'identical samples {np.mean(firsts == n_steps):.3f}')

    # same-context logit delta: identical prefill, then ONE decode step at
    # pos=1 (the first step that exercises the kernel) with a FIXED cell,
    # comparing the depth logits the next draw would see
    from hqtransformer_tpu.models.stage2.hierarchical import HierarchicalGPT
    hp = m.hparams
    B = args.batch
    deltas = []
    for attn, packed in [('packed', True), ('einsum', False)]:
        sos = m.apply(v2, B, labels, method=HierarchicalGPT.sos_tokens)
        if packed:
            # time dim must respect the kernel's row-chunk granularity
            # (HQT_ATTN_ROW_CHUNK-configurable, pallas_attention.py:46)
            from hqtransformer_tpu.ops.pallas_attention import ROW_CHUNK
            kc = jnp.zeros((hp.n_layers, ROW_CHUNK, B, hp.embed_dim),
                           jnp.bfloat16)
        else:
            from hqtransformer_tpu.models.stage2.layers import kv_cache_shape
            kc = jnp.zeros(kv_cache_shape(
                hp.n_layers, B, hp.n_heads, 2,
                hp.embed_dim // hp.n_heads), jnp.bfloat16)
        vc = jnp.zeros_like(kc)
        _, kc, vc = m.apply(v2, sos, kc, vc, 0,
                            method=HierarchicalGPT.spatial_step)
        x1 = m.apply(v2, jnp.zeros((B,), jnp.int32),
                     jnp.zeros((B, m.ratio_bot2top), jnp.int32),
                     jnp.zeros((B,), jnp.int32),
                     method=HierarchicalGPT.embed_cell_step)
        h, kc, vc = m.apply(v2, x1, kc, vc, jnp.int32(1),
                            method=HierarchicalGPT.spatial_step)
        lt, _ = m.apply(v2, h[:, -1],
                        method=HierarchicalGPT.depth_first_logits)
        deltas.append(np.asarray(lt, np.float32))
    d = np.abs(deltas[0] - deltas[1])
    scale = np.abs(deltas[1]).mean()
    print(f'[step-1 logits] mean|delta| {d.mean():.5f}  max|delta| '
          f'{d.max():.4f}  mean|logit| {scale:.3f}  '
          f'rel {d.mean() / scale:.2e}')


if __name__ == '__main__':
    main()
