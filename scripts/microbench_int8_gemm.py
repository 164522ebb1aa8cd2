#!/usr/bin/env python
"""Isolated probe: bf16 vs static-quantized int8 matmuls at the depth-chain
gemm shapes (the single largest AR phase, 14.5 ms/step at the 142 TF/s bf16
ceiling — `scripts/ablate_ar.py`). Decides whether an int8 stage-2 serving
path is worth building: prior dynamic-quant int8 measured only 1.18x
(README), but that included per-call activation sweeps; here the operands
are quantized OUTSIDE the timed loop (what calibrated scales would give),
upper-bounding the reachable speedup.

Loop-carried dependency chains defeat XLA hoisting; a scalar fetch forces
completion (block_until_ready returns early through the axon relay).

  python scripts/microbench_int8_gemm.py [--m 8192] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp

# flagship depth-chain shapes at B=2048, r=4 tokens/step: fused qkv,
# mlp_0, mlp_2, proj, head_bot (D=1536, Vb=8192)
SHAPES = [(1536, 4608, 'qkv'), (1536, 6144, 'mlp0'), (6144, 1536, 'mlp2'),
          (1536, 1536, 'proj'), (1536, 8192, 'head_bot')]


def bench(fn, x0, iters):
    x = fn(x0)
    float(jnp.sum(x[:1, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    float(jnp.sum(x[:1, :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--m', type=int, default=8192)
    ap.add_argument('--iters', type=int, default=30)
    args = ap.parse_args()
    m = args.m

    # evaluate each shape independently (fresh compile per shape)
    results = {}
    for k, n, name in SHAPES:
        key = jax.random.PRNGKey(0)
        w = jax.random.normal(key, (k, n), jnp.bfloat16)
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) * 42.0),
                      -127, 127).astype(jnp.int8)
        x0 = jax.random.normal(key, (m, k), jnp.bfloat16)

        @jax.jit
        def bf16_chain(x, w=w, k=k, n=n):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            # fold back to [m, k] with a cheap data-dependent reshape/slice
            y = y[:, :k] if n >= k else jnp.tile(y, (1, -(-k // n)))[:, :k]
            return y.astype(jnp.bfloat16)

        @jax.jit
        def int8_chain(x, wq=wq, k=k, n=n):
            # static scales: quantize the activation with ONE multiply+round
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 16.0),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (1 / (16.0 * 42.0))
            y = y[:, :k] if n >= k else jnp.tile(y, (1, -(-k // n)))[:, :k]
            return y.astype(jnp.bfloat16)

        t_bf = bench(bf16_chain, x0, args.iters)
        t_q = bench(int8_chain, x0, args.iters)
        gflop = 2 * m * k * n / 1e9
        results[name] = (t_bf, t_q)
        print(f'{name:9s} [{m},{k}]x[{k},{n}]: bf16 {t_bf * 1e3:7.3f} ms '
              f'({gflop / t_bf / 1e3:6.1f} TF/s) | int8(static) '
              f'{t_q * 1e3:7.3f} ms ({gflop / t_q / 1e3:6.1f} TF/s) | '
              f'{t_bf / t_q:4.2f}x', flush=True)

    tot_bf = sum(t for t, _ in results.values())
    tot_q = sum(t for _, t in results.values())
    print(f'TOTAL bf16 {tot_bf * 1e3:.3f} ms | int8 {tot_q * 1e3:.3f} ms | '
          f'{tot_bf / tot_q:.2f}x')


if __name__ == '__main__':
    main()
