"""Pallas TPU kernel: fused codebook distance + argmin.

The VQ hot loop (`hqvae/models/stage1/modules/quantizer.py:99-103`) computes
`argmin_k |z_n - e_k|^2`. The XLA lowering materializes the full [N, K]
distance matrix in HBM (e.g. 4096 x 8192 f32 = 128 MB per encode at
batch 16) and then reduces it — two full HBM round-trips. This kernel tiles
the codebook through VMEM and keeps a running (min, argmin) accumulator per
row, so scores never leave VMEM: one MXU matmul per (row-tile, code-tile)
and O(N) HBM traffic.

|z|^2 is dropped (constant per row, argmin-invariant); the score is
|e_k|^2 - 2 z.e_k, computed in f32 like the reference. Ties resolve to the
first (lowest) index, matching torch.argmin/jnp.argmin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256
TILE_K = 512


def _vq_kernel(z_ref, e_ref, esq_ref, codes_ref, run_min, run_arg):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        run_min[:] = jnp.full_like(run_min, jnp.inf)
        run_arg[:] = jnp.zeros_like(run_arg)

    z = z_ref[:].astype(jnp.float32)
    e = e_ref[:].astype(jnp.float32)
    # scores[n, k] = |e_k|^2 - 2 z_n . e_k   (argmin-equivalent distance)
    scores = esq_ref[:] - 2.0 * jax.lax.dot_general(
        z, e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    tile_k = e.shape[0]
    local_min = jnp.min(scores, axis=1, keepdims=True)
    local_arg = jnp.argmin(scores, axis=1).reshape(-1, 1) + j * tile_k

    better = local_min < run_min[:]
    run_arg[:] = jnp.where(better, local_arg, run_arg[:])
    run_min[:] = jnp.where(better, local_min, run_min[:])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        codes_ref[:] = run_arg[:]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=('interpret',))
def vq_argmin_pallas(z_flat: jax.Array, embedding: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """codes[n] = argmin_k |z_n - e_k|^2. z_flat: [N, D], embedding: [K, D].
    Pads N to a row-tile multiple and K to a code-tile multiple (padded codes
    get +inf scores via their |e|^2 column)."""
    n, d = z_flat.shape
    k = embedding.shape[0]
    # adaptive tiles: z + e blocks are double-buffered f32 in VMEM, so keep
    # 2 * (tile_n + tile_k) * d * 4 bytes within budget (level-3 configs
    # reach d = 4096, where the default 256/512 tiles OOM scoped vmem)
    budget = 24 * 1024 * 1024
    tile_n, tile_k = TILE_N, TILE_K
    while 2 * (tile_n + tile_k) * d * 4 > budget and tile_k > 128:
        tile_k //= 2
        if 2 * (tile_n + tile_k) * d * 4 > budget and tile_n > 128:
            tile_n //= 2
    n_pad = _round_up(max(n, 8), tile_n)
    k_pad = _round_up(k, tile_k)

    z = jnp.zeros((n_pad, d), jnp.float32).at[:n].set(
        z_flat.astype(jnp.float32))
    e = jnp.zeros((k_pad, d), jnp.float32).at[:k].set(
        embedding.astype(jnp.float32))
    esq = jnp.full((1, k_pad), jnp.inf, jnp.float32).at[0, :k].set(
        jnp.sum(embedding.astype(jnp.float32) ** 2, axis=1))

    grid = (n_pad // tile_n, k_pad // tile_k)
    codes = pl.pallas_call(
        _vq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_k, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tile_k), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_n, 1), jnp.float32),
            pltpu.VMEM((tile_n, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k_pad * d,
            bytes_accessed=(n_pad * d + k_pad * d) * 4 + n_pad * 4,
            transcendentals=0),
        interpret=interpret,
    )(z, e, esq)
    return codes[:n, 0]
