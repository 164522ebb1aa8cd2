#!/usr/bin/env python
"""Perf probe: AR-loop vs pixel-decode split and batch scaling for the
flagship L12 sampler on the current backend. Not part of the driver
contract — a working tool for kernel tuning (see bench.py for the
driver-facing number)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.twostage import TwoStageModel
from hqtransformer_tpu.sampling.engine import (SamplingParams,
                                               make_hierarchical_sampler)
from hqtransformer_tpu.models.stage2.hierarchical import cells_to_raster

CONFIG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'configs', 'imagenet', 'stage2',
    'hqtransformer-l12-top8x8.yaml')


def force(x):
    x.block_until_ready()
    return float(jnp.sum(x.reshape(-1)[:1].astype(jnp.float32)))


def timeit(fn, *args, loops=3):
    out = fn(*args)
    leaves = [l for l in jax.tree.leaves(out)]
    force(leaves[0])
    ts = []
    for _ in range(loops):
        t0 = time.perf_counter()
        out = fn(*args)
        force(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', type=str, default='512')
    ap.add_argument('--loops', type=int, default=3)
    ap.add_argument('--segments', type=int, default=2)
    ap.add_argument('--what', type=str, default='ar,decode,e2e')
    args = ap.parse_args()

    cfg = build_twostage_config(CONFIG)
    model = TwoStageModel(cfg, dtype=jnp.bfloat16)
    variables = model.init_variables(jax.random.PRNGKey(0))
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x, variables)
    sp = SamplingParams(top_k_top=2048, top_k_bot=2048,
                        temperature_top=0.95, temperature_bot=0.95)
    what = args.what.split(',')

    for B in [int(b) for b in args.batches.split(',')]:
        labels = jnp.arange(B, dtype=jnp.int32) % 1000
        key = jax.random.PRNGKey(1)
        res = {}
        if 'ar' in what or 'decode' in what:
            ar = make_hierarchical_sampler(model.stage2, 64, sp,
                                           cache_dtype=jnp.bfloat16,
                                           n_segments=args.segments)
            dt = timeit(lambda: ar(variables['stage2'], key, labels),
                        loops=args.loops)
            res['ar_ms'] = dt * 1e3
            res['ar_sps'] = B / dt
        if 'decode' in what:
            codes_t, codes_b = ar(variables['stage2'], key, labels)
            ct = codes_t.reshape(-1, 8, 8)
            cb = cells_to_raster(codes_b, 8, 2).reshape(-1, 16, 16)

            @jax.jit
            def dec(variables, ct, cb):
                n = ct.shape[0] // 128 if ct.shape[0] % 128 == 0 \
                    and ct.shape[0] > 128 else 1
                if n > 1:
                    px = jax.lax.map(
                        lambda a: model.stage1.apply(
                            variables['stage1'], a[0], a[1],
                            method=type(model.stage1).decode_code),
                        (ct.reshape(n, -1, 8, 8), cb.reshape(n, -1, 16, 16)))
                    px = px.reshape(-1, *px.shape[2:])
                else:
                    px = model.stage1.apply(
                        variables['stage1'], ct, cb,
                        method=type(model.stage1).decode_code)
                return jnp.clip(px * 0.5 + 0.5, 0., 1.)

            dt = timeit(lambda: dec(variables, ct, cb), loops=args.loops)
            res['decode_ms'] = dt * 1e3
            res['decode_sps'] = B / dt
        if 'e2e' in what:
            sampler = model.make_pixel_sampler(params=sp,
                                               cache_dtype=jnp.bfloat16)
            dt = timeit(lambda: sampler(variables, key, labels),
                        loops=args.loops)
            res['e2e_ms'] = dt * 1e3
            res['e2e_sps'] = B / dt
        msg = ' '.join(f'{k}={v:.1f}' for k, v in res.items())
        print(f'B={B} segments={args.segments} {msg}', flush=True)


if __name__ == '__main__':
    main()
