#!/usr/bin/env python
"""Does one program running [AR sampling of batch k+1] + [conv decode of
batch k's codes] beat the serial sum? If XLA's latency-hiding scheduler
prefetches the AR loop's KV-cache reads under the decoder's MXU-bound
convs (and vice versa), pipelined steady-state throughput wins."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.twostage import TwoStageModel
from hqtransformer_tpu.models.stage2.hierarchical import cells_to_raster
from hqtransformer_tpu.sampling.engine import (SamplingParams,
                                               make_hierarchical_sampler)

CONFIG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'configs', 'imagenet', 'stage2',
    'hqtransformer-l12-top8x8.yaml')


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
    B = int(os.environ.get('B', '512'))
    cfg = build_twostage_config(CONFIG)
    model = TwoStageModel(cfg, dtype=jnp.bfloat16)
    variables = model.init_variables(jax.random.PRNGKey(0))
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x, variables)
    sp = SamplingParams(top_k_top=2048, top_k_bot=2048,
                        temperature_top=0.95, temperature_bot=0.95)
    ar = make_hierarchical_sampler(model.stage2, 64, sp,
                                   cache_dtype=jnp.bfloat16, n_segments=4)
    labels = jnp.arange(B, dtype=jnp.int32) % 1000

    def decode(variables, ct_flat, cb_cells):
        ct = ct_flat.reshape(-1, 8, 8)
        cb = cells_to_raster(cb_cells, 8, 2).reshape(-1, 16, 16)
        n = max(1, B // 128)
        px = jax.lax.map(
            lambda a: model.stage1.apply(variables['stage1'], a[0], a[1],
                                         method=type(model.stage1)
                                         .decode_code),
            (ct.reshape(n, -1, 8, 8), cb.reshape(n, -1, 16, 16)))
        return jnp.clip(px * 0.5 + 0.5, 0., 1.)

    @jax.jit
    def fused(variables, key, labels, prev_ct, prev_cb):
        ct, cb = ar(variables['stage2'], key, labels)
        px = decode(variables, prev_ct, prev_cb)
        return ct, cb, px

    key = jax.random.PRNGKey(1)
    ct0, cb0 = ar(variables['stage2'], key, labels)
    dt = timed(fused, variables, key, labels, ct0, cb0)
    print(f'B={B} fused AR+decode(prev): {dt*1e3:.1f} ms '
          f'-> steady-state {B/dt:.1f} samples/s', flush=True)


if __name__ == '__main__':
    main()
