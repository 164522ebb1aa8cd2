#!/usr/bin/env python
"""Microbenchmark of decode-attention formulations for the spatial step.

Each variant runs a 63-step lax.scan over 12 'layers' of ONLY the attention
piece (cache write + scores + softmax + AV), carrying the caches, at the
flagship shapes (B=512, nh=24, hd=64, T=64). A gemm-only variant gives the
per-layer matmul floor for the full block (qkv+proj+mlp).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp
import numpy as np

B, NH, HD, T, L = (int(os.environ.get('ATTN_B', '512')), 24, 64,
                   int(os.environ.get('ATTN_T', '64')), 12)
D = NH * HD
STEPS = T - 1
DT = jnp.bfloat16


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[:1].astype(jnp.float32)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        float(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[:1]
                      .astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f'{name:24s} {dt*1000:9.2f} ms total  {dt*1000/STEPS:7.3f} ms/step')


def scan12(body_layer, carry_caches, x0):
    """Scan 63 steps x 12 layers of body_layer(x, caches, l, i)."""
    def body(carry, i):
        kc, vc = carry
        x = x0
        for l in range(L):
            x, kc, vc = body_layer(x, kc, vc, l, i)
        return (kc, vc), x[0, 0, 0]
    (kc, vc), out = jax.lax.scan(body, carry_caches, jnp.arange(1, T))
    return out


def main():
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, 1, D), DT)

    # A) per-head layout [L, B, nh, T, hd]
    def layer_perhead(x, kc, vc, l, i):
        q = x.reshape(B, 1, NH, HD).transpose(0, 2, 1, 3)
        kn = vn = q
        kc = jax.lax.dynamic_update_slice(kc, kn[None].astype(kc.dtype),
                                          (l, 0, 0, i, 0))
        vc = jax.lax.dynamic_update_slice(vc, vn[None].astype(vc.dtype),
                                          (l, 0, 0, i, 0))
        att = jnp.einsum('bhqd,bhkd->bhqk', q, kc[l].astype(q.dtype),
                         preferred_element_type=jnp.float32)
        att = jax.nn.softmax(
            jnp.where((jnp.arange(T) <= i)[None, None, None], att, -1e10),
            axis=-1)
        y = jnp.einsum('bhqk,bhkd->bhqd', att.astype(x.dtype),
                       vc[l].astype(x.dtype))
        return y.transpose(0, 2, 1, 3).reshape(B, 1, D), kc, vc

    if 'perhead' in WANT:
        kc = jnp.zeros((L, B, NH, T, HD), DT)
        timeit('A per-head', jax.jit(
            lambda kc, vc, x0: scan12(layer_perhead, (kc, vc), x0)),
            kc, jnp.zeros_like(kc), x0)

    # C) all-heads packed [L, B, T, D], parity-masked q, per-b matmuls
    par = (jnp.arange(D) // HD)[None, :] == jnp.arange(NH)[:, None]

    def layer_allheads(x, kc, vc, l, i):
        q = x[:, 0, :]                                      # [B, D]
        kc = jax.lax.dynamic_update_slice(kc, x[None].astype(kc.dtype),
                                          (l, 0, i, 0))
        vc = jax.lax.dynamic_update_slice(vc, x[None].astype(vc.dtype),
                                          (l, 0, i, 0))
        qm = jnp.einsum('bc,hc->bhc', q, par.astype(x.dtype))  # [B, nh, D]
        att = jnp.einsum('btc,bhc->bht', kc[l].astype(x.dtype), qm,
                         preferred_element_type=jnp.float32)
        att = jax.nn.softmax(
            jnp.where((jnp.arange(T) <= i)[None, None], att, -1e10), axis=-1)
        y2 = jnp.einsum('bht,btc->bhc', att.astype(x.dtype),
                        vc[l].astype(x.dtype))
        y = jnp.einsum('bhc,hc->bc', y2, par.astype(x.dtype))
        return y[:, None, :], kc, vc

    if 'allheads' in WANT:
        kc = jnp.zeros((L, B, T, D), DT)
        timeit('C all-heads packed', jax.jit(
            lambda kc, vc, x0: scan12(layer_allheads, (kc, vc), x0)),
            kc, jnp.zeros_like(kc), x0)

    # E) Pallas fused decode-attention kernel, packed [L, B, T, D] caches
    if 'pallas' in WANT:
        from hqtransformer_tpu.ops.pallas_attention import (
            decode_attention_step)
        bb = int(os.environ.get('ATTN_BLOCK_B', '32'))

        def pallas_scan(x0):
            # caches allocated inside jit: passing 4.8 GB args at B=2048
            # doubles HBM and OOMs
            kc = jnp.zeros((L, T, B, D), DT)
            vc = jnp.zeros_like(kc)
            def body(carry, i):
                kc, vc = carry
                x = x0[:, 0, :]
                for l in range(L):
                    x, kc, vc = decode_attention_step(
                        x, x, x, kc, vc, l, i, NH, block_b=bb)
                return (kc, vc), x[0, 0]
            (kc, vc), out = jax.lax.scan(body, (kc, vc), jnp.arange(1, T))
            return out

        timeit(f'E pallas (bb={bb})', jax.jit(pallas_scan), x0)

    # D) gemm-only floor: qkv + proj + mlp for 12 layers, no attention
    Ws = [dict(
        qkv=jax.random.normal(jax.random.PRNGKey(l), (D, 3 * D), DT) * 0.02,
        proj=jax.random.normal(jax.random.PRNGKey(l + 50), (D, D), DT) * .02,
        m0=jax.random.normal(jax.random.PRNGKey(l + 100), (D, 4 * D), DT) * .02,
        m1=jax.random.normal(jax.random.PRNGKey(l + 150), (4 * D, D), DT) * .02)
        for l in range(L)]

    def gemms(x0):
        def body(x, i):
            for l in range(L):
                h = jnp.dot(x, Ws[l]['qkv'])[..., :D]
                h = jnp.dot(h, Ws[l]['proj'])
                h = jnp.dot(h, Ws[l]['m0'])
                x = x + jnp.dot(jax.nn.gelu(h, approximate=True),
                                Ws[l]['m1'])
            return x, x[0, 0]
        x, out = jax.lax.scan(body, x0, jnp.arange(1, T))
        return out

    if 'gemms' in WANT:
        timeit('D gemm-only floor', jax.jit(gemms), x0[:, 0, :][:, None, :])


if __name__ == '__main__':
    WANT = set(sys.argv[1:]) or {'perhead', 'allheads', 'gemms', 'pallas'}
    main()
