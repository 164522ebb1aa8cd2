#!/usr/bin/env python
"""Ablation profiler for the AR decode loop: times each component of the
sampling scan in isolation on the real chip, to attribute the per-step cost
(spatial layers / depth head / sampling / embedding / scan-carry overhead).

Usage: python scripts/profile_decode.py [variant ...]
Variants (default: all): e2e ar ar1seg spatial spatial_carry carry depth
sampling embed decode
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.twostage import TwoStageModel
from hqtransformer_tpu.models.stage2.hierarchical import HierarchicalGPT
from hqtransformer_tpu.sampling.engine import (SamplingParams,
                                               make_hierarchical_sampler,
                                               _depth_sample_parallel)

CONFIG = os.environ.get('BENCH_CONFIG', os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', 'configs', 'imagenet',
    'stage2', 'hqtransformer-l12-top8x8.yaml'))
B = int(os.environ.get('BENCH_BATCH', '512'))
STEPS = 63  # spatial scan steps after prefill


def build():
    cfg = build_twostage_config(CONFIG)
    model = TwoStageModel(cfg, dtype=jnp.bfloat16)
    variables = model.init_variables(jax.random.PRNGKey(0))
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x, variables)
    return model, variables


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    # scalar fetch to be safe on tunneled backends
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.sum(leaf.reshape(-1)[:1].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f'{name:16s} {dt*1000:9.2f} ms total  {dt*1000/STEPS:7.3f} ms/step '
          f'  {dt*1000/B:6.3f} ms/sample')
    return dt


def main():
    want = set(sys.argv[1:]) or {
        'e2e', 'ar', 'ar1seg', 'spatial', 'carry', 'depth', 'sampling',
        'embed', 'decode'}
    model, variables = build()
    m: HierarchicalGPT = model.stage2
    hp = m.hparams
    nh, hd, L = hp.n_heads, hp.embed_dim // hp.n_heads, hp.n_layers
    D = hp.embed_dim
    sp = SamplingParams(top_k_top=2048, top_k_bot=2048,
                        temperature_top=0.95, temperature_bot=0.95)
    labels = jnp.arange(B, dtype=jnp.int32) % 1000
    key = jax.random.PRNGKey(1)
    v2 = variables['stage2']
    cdt = jnp.bfloat16

    if 'e2e' in want:
        pipe = model.make_pipelined_sampler(params=sp, cache_dtype=cdt,
                                            n_segments=4)
        codes, px = pipe(variables, key, labels, None)
        jax.block_until_ready(px)
        timeit('e2e(pipelined)', lambda: pipe(variables, key, labels, codes))

    if 'ar' in want:
        s4 = make_hierarchical_sampler(m, 64, sp, cache_dtype=cdt,
                                       n_segments=4)
        timeit('ar(4seg)', s4, v2, key, labels)
    if 'ar1seg' in want:
        s1 = make_hierarchical_sampler(m, 64, sp, cache_dtype=cdt,
                                       n_segments=1)
        timeit('ar(1seg)', s1, v2, key, labels)

    T = 64
    packed = jax.default_backend() == 'tpu'

    def make_caches():
        # caches are created INSIDE the jitted fn: passing them as args
        # doubles the HBM footprint (args can't alias the carry) and OOMs
        # at B=2048
        if packed:
            kc = jnp.zeros((L, T, B, D), cdt)   # packed: Pallas kernel path
        else:
            kc = jnp.zeros((L, B, nh, T, hd), cdt)
        return kc, jnp.zeros_like(kc)

    x1 = jnp.zeros((B, 1, D), jnp.bfloat16)

    if 'spatial' in want:
        # spatial transformer only: constant input token, cache carried —
        # same packed-cache kernel path the sampler uses on TPU
        @jax.jit
        def run_spatial(v2):
            kc, vc = make_caches()
            def body(carry, i):
                kc, vc = carry
                h, kc, vc = m.apply(v2, x1, kc, vc, i,
                                    method=HierarchicalGPT.spatial_step)
                return (kc, vc), h[:, -1, 0]
            (kc, vc), hs = jax.lax.scan(body, (kc, vc),
                                        jnp.arange(1, T))
            return hs
        timeit('spatial-only', run_spatial, v2)

    if 'carry' in want:
        # carry-copy overhead probe: same scan, body only touches one row
        @jax.jit
        def run_carry():
            kc, vc = make_caches()
            row = jnp.ones((L, B, nh, 1, hd), cdt) if not packed else \
                jnp.ones((L, 1, B, D), cdt)
            def body(carry, i):
                kc, vc = carry
                at = (0, 0, 0, i, 0) if not packed else (0, i, 0, 0)
                kc = jax.lax.dynamic_update_slice(kc, row, at)
                vc = jax.lax.dynamic_update_slice(vc, row, at)
                return (kc, vc), kc.reshape(-1)[0]
            (kc, vc), out = jax.lax.scan(body, (kc, vc), jnp.arange(1, T))
            return out
        timeit('carry-only', run_carry)

    if 'depth' in want:
        # depth head + sampling, fixed h, no cache carry
        h = jnp.zeros((B, D), jnp.bfloat16)
        @jax.jit
        def run_depth(v2, key):
            def body(key, i):
                key, ki = jax.random.split(key)
                t, b = _depth_sample_parallel(m, v2, h, ki, sp)
                return key, (t[0], b[0, 0])
            _, out = jax.lax.scan(body, key, jnp.arange(1, T))
            return out
        timeit('depth+sample', run_depth, v2, key)

    if 'dfirst' in want:
        h0 = jnp.zeros((B, D), jnp.bfloat16)
        @jax.jit
        def run_dfirst(v2):
            def body(h, i):
                lt, kv = m.apply(v2, h,
                                 method=HierarchicalGPT.depth_first_logits)
                h = h + lt[:, :D].astype(h.dtype) * 1e-6  # carry dependency
                return h, lt[0, 0]
            _, out = jax.lax.scan(body, h0, jnp.arange(1, T))
            return out
        timeit('depth-first', run_dfirst, v2)

    if 'dheads' in want:
        hx0 = jnp.zeros((B, 4, D), jnp.bfloat16)
        @jax.jit
        def run_heads(v2):
            def body(hx, i):
                lb = m.apply(v2, hx,
                             method=lambda mm, v: mm.head_bot(mm.ln_bot(v)))
                hx = hx + lb[:, :, :D].astype(hx.dtype) * 1e-6
                return hx, lb[0, 0, 0]
            _, out = jax.lax.scan(body, hx0, jnp.arange(1, T))
            return out
        timeit('head_bot-only', run_heads, v2)

    if 'headgemm' in want:
        W = jax.random.normal(key, (D, 8192), jnp.bfloat16) * 0.02
        hx0 = jnp.zeros((B * 4, D), jnp.bfloat16)
        @jax.jit
        def run_headgemm(W):
            def body(hx, i):
                y = jnp.dot(hx, W)
                return hx + y[:, :D] * 1e-6, y[0, 0]
            _, out = jax.lax.scan(body, hx0, jnp.arange(1, T))
            return out
        timeit('headgemm-raw', run_headgemm, W)

    if 'dsecond' in want:
        h = jnp.zeros((B, D), jnp.bfloat16)
        @jax.jit
        def run_dsecond(v2):
            lt, kv0 = m.apply(v2, h, method=HierarchicalGPT.depth_first_logits)
            def body(codes, i):
                lb, kv = m.apply(v2, codes, kv0, 1,
                                 method=HierarchicalGPT.depth_second_logits)
                codes = jnp.argmax(lb[:, :1, :], axis=-1).astype(jnp.int32)
                return codes, lb[0, 0, 0]
            _, out = jax.lax.scan(body, jnp.zeros((B, 1), jnp.int32),
                                  jnp.arange(1, T))
            return out
        timeit('dsecond-real', run_dsecond, v2)

    if 'sampling' in want:
        from hqtransformer_tpu.ops.topk_topp import sample_from_logits
        # logits as a jit ARG (a captured constant this size breaks the
        # remote-compile upload) in the sampler's real dtype (bf16 model
        # heads emit bf16 logits)
        logits = jax.device_put(jax.random.normal(
            key, (B, 5, 8192), jnp.float32).astype(jnp.bfloat16))
        @jax.jit
        def run_sampling(key, logits):
            def body(key, i):
                key, ki = jax.random.split(key)
                c = sample_from_logits(ki, logits, temperature=0.95,
                                       top_k=2048)
                return key, c[0, 0]
            _, out = jax.lax.scan(body, key, jnp.arange(1, T))
            return out
        timeit('sampling-only', run_sampling, key, logits)

    if 'embed' in want:
        ct0 = jnp.zeros((B,), jnp.int32)
        cb0 = jnp.zeros((B, m.ratio_bot2top), jnp.int32)
        @jax.jit
        def run_embed(v2):
            def body(carry, i):
                ct, cb = carry
                x = m.apply(v2, ct, cb, jnp.full((B,), i, jnp.int32),
                            method=HierarchicalGPT.embed_cell_step)
                ct = (ct + x[:, 0, 0].astype(jnp.int32)) % 8192
                return (ct, cb), x[0, 0, 0]
            _, out = jax.lax.scan(body, (ct0, cb0), jnp.arange(1, T))
            return out
        timeit('embed-only', run_embed, v2)

    if 'decode' in want:
        ct = jnp.zeros((B, 8, 8), jnp.int32)
        cb = jnp.zeros((B, 16, 16), jnp.int32)
        @jax.jit
        def run_decode(variables, ct, cb):
            def dec_chunk(args):
                px = model.stage1.apply(
                    variables['stage1'], *args,
                    method=type(model.stage1).decode_code)
                # per-chunk reduction instead of stacking pixels: the
                # mapped [n, 128, 256, 256, 3] bf16 output picks a
                # lane-padded layout (3 -> 128) and OOMs at B=2048
                return jnp.sum(jnp.clip(px * 0.5 + 0.5, 0.0, 1.0),
                               axis=(1, 2, 3))
            n = B // 128
            return jax.lax.map(dec_chunk, (ct.reshape(n, 128, 8, 8),
                                           cb.reshape(n, 128, 16, 16)))
        dt = timeit('decode-only', run_decode, variables, ct, cb)
        print(f'  (decode: {dt*1000/B:.3f} ms/sample over {B})')


if __name__ == '__main__':
    main()
