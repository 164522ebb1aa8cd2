#!/usr/bin/env python
"""Per-component cost of one AR decode step at batch B, measured as a
64-iteration scan per component with a serial dependency threaded through
the carry (prevents cross-iteration pipelining, which made round-1 isolated
numbers optimistic). Reports (total - DISPATCH_MS)/64 per step.

Dispatch through the axon relay costs ~55 ms per program invocation; it is
measured here explicitly with an empty program."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.twostage import TwoStageModel
from hqtransformer_tpu.sampling.engine import SamplingParams
from hqtransformer_tpu.models.stage2.hierarchical import HierarchicalGPT
from hqtransformer_tpu.ops.topk_topp import sample_from_logits

CONFIG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'configs', 'imagenet', 'stage2',
    'hqtransformer-l12-top8x8.yaml')
STEPS = 64


def timed(fn, *args, loops=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[:1].astype(jnp.float32)))
    ts = []
    for _ in range(loops):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        float(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[:1]
                      .astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--parts', type=str,
                    default='dispatch,spatial,embed,p1,p2,sample')
    ap.add_argument('--approx-gelu', action='store_true',
                    help='diagnostic: sigmoid gelu instead of exact erf')
    args = ap.parse_args()
    B = args.batch
    parts = args.parts.split(',')

    cfg = build_twostage_config(CONFIG)
    if args.approx_gelu:
        cfg.stage2.hparams.gelu_use_approx = True
    model = TwoStageModel(cfg, dtype=jnp.bfloat16)
    variables = model.init_variables(jax.random.PRNGKey(0))
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x, variables)
    v2 = variables['stage2']
    m = model.stage2
    hp = m.hparams
    D, nh, nl = hp.embed_dim, hp.n_heads, hp.n_layers
    hd = D // nh
    V = 8192
    sp = SamplingParams(top_k_top=2048, top_k_bot=2048,
                        temperature_top=0.95, temperature_bot=0.95)

    # dispatch overhead
    if 'dispatch' in parts:
        z = jnp.zeros((8, 128), jnp.float32)
        f0 = jax.jit(lambda x: x + 1)
        dispatch = timed(f0, z, loops=5)
        print(f'dispatch overhead: {dispatch*1e3:.1f} ms', flush=True)
    else:
        dispatch = 0.055

    def report(name, total):
        print(f'{name}: {(total - dispatch)/STEPS*1e3:.2f} ms/step '
              f'(program {total*1e3:.0f} ms)', flush=True)

    if 'spatial' in parts:
        @jax.jit
        def spatial_scan(v2, x0):
            kc = jnp.zeros((nl, B, nh, int(os.environ.get('TCACHE', '65')),
                            hd), jnp.bfloat16)
            vc = jnp.zeros_like(kc)

            def body(carry, i):
                x, kc, vc = carry
                h, kc, vc = m.apply(v2, x, kc, vc, i,
                                    method=HierarchicalGPT.spatial_step)
                return (h, kc, vc), ()

            (x, _, _), _ = jax.lax.scan(body, (x0, kc, vc),
                                        jnp.arange(STEPS))
            return x

        x0 = jnp.ones((B, 1, D), jnp.bfloat16)
        report('spatial(12L, full 65-cache)', timed(spatial_scan, v2, x0))

    if 'embed' in parts:
        @jax.jit
        def embed_scan(v2, c0, b0):
            def body(carry, i):
                ct, cb = carry
                x = m.apply(v2, ct, cb, jnp.full((B,), i, jnp.int32),
                            method=HierarchicalGPT.embed_cell_step)
                d = jnp.sum(x.astype(jnp.float32)).astype(jnp.int32) % 7
                return ((ct + d) % V, (cb + d) % V), ()

            (ct, _), _ = jax.lax.scan(body, (c0, b0), jnp.arange(STEPS))
            return ct

        c0 = jnp.zeros((B,), jnp.int32)
        b0 = jnp.zeros((B, 4), jnp.int32)
        report('embed_cell', timed(embed_scan, v2, c0, b0))

    if 'p1' in parts:
        @jax.jit
        def p1_scan(v2, h0):
            def body(h, _):
                logits, _ = m.apply(v2, h,
                                    method=HierarchicalGPT.depth_first_logits)
                return h + logits[:, :D].astype(h.dtype) * 1e-6, ()

            h, _ = jax.lax.scan(body, h0, None, length=STEPS)
            return h

        h0 = jnp.ones((B, D), jnp.bfloat16)
        report('depth pass1 (+head_top)', timed(p1_scan, v2, h0))

    if 'p2' in parts:
        h0 = jnp.ones((B, D), jnp.bfloat16)
        _, kv0 = m.apply(v2, h0, method=HierarchicalGPT.depth_first_logits)

        @jax.jit
        def p2_scan(v2, kv0, c0):
            def body(codes, _):
                logits, _ = m.apply(v2, codes, kv0, 1,
                                    method=HierarchicalGPT.depth_second_logits)
                nxt = (codes + jnp.sum(logits.astype(jnp.float32))
                       .astype(jnp.int32) % 7) % V
                return nxt, ()

            c, _ = jax.lax.scan(body, c0, None, length=STEPS)
            return c

        c0 = jnp.zeros((B, 1), jnp.int32)
        report('depth pass2 (+head_bot)', timed(p2_scan, v2, kv0, c0))

    if 'sample' in parts:
        @jax.jit
        def sample_scan(key, lt0, lb0):
            def body(carry, _):
                lt, lb, key = carry
                key, k1, k2 = jax.random.split(key, 3)
                top = sample_from_logits(k1, lt, temperature=0.95, top_k=2048)
                bot = sample_from_logits(k2, lb, temperature=0.95, top_k=2048)
                lt = lt + top[:, None].astype(jnp.float32) * 1e-9
                lb = lb + bot[:, :, None].astype(jnp.float32) * 1e-9
                return (lt, lb, key), ()

            (lt, _, _), _ = jax.lax.scan(body, (lt0, lb0, key), None,
                                         length=STEPS)
            return lt

        lt0 = jnp.ones((B, V), jnp.float32)
        lb0 = jnp.ones((B, 4, V), jnp.float32)
        report('sampling (top + 4bot draws)',
               timed(sample_scan, jax.random.PRNGKey(0), lt0, lb0))


if __name__ == '__main__':
    main()
