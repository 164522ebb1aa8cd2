"""Pallas TPU kernel: fused top-k-filtered categorical sampling.

Per decode step the sampler draws from softmax(logits/T) restricted to the
top-k logits (`hqvae/utils/sampling.py:105-109`). The XLA lowering is
latency-bound: a sort (or ~30 bisection kernels) for the k-th-value
threshold, a 10M-element PRNG for the Gumbel draw, softmax passes — each a
separate kernel launch per AR step. This kernel does the whole pipeline in
ONE launch with the logits row-tile resident in VMEM:

  1. per-row k-th-value threshold by bisection (on-chip loop, no launches);
  2. masked exp (numerically shifted by the row max);
  3. inverse-CDF draw with a single precomputed uniform per row. Mosaic has
     no cumsum lowering, so the prefix sums are built from MXU matmuls:
     strict-lower-triangular ones over the 128-wide block sums for the
     exclusive block prefix, lower-triangular ones within each block.

Inverse-CDF with one uniform is distribution-identical to Gumbel/categorical;
the kept set equals exact top-k-with-ties (see
`ops/topk_topp.kth_largest_threshold`). Sampling therefore stays exact — only
this framework's (documented) RNG stream convention changes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 128
LANE = 128
# Bisection window below the row max. Elements further than 44 below the
# max have exp(x - max) < 7e-20 against a total mass >= exp(0) = 1, so in a
# single f32 accumulation their CDF increment rounds to zero (2^-24
# relative) and inverse-CDF can essentially never select them. The
# two-level prefix sum does accumulate small blocks separately, so logits
# in (max-88, max-44) can retain nonzero mass in blocks not containing the
# row max — the distribution shift from clamping the top-k threshold to
# [max-44, max] is therefore negligible (<~1e-16 total mass), not strictly
# bit-identical. Restricting the search saves bisection passes (each pass
# is a full VPU sweep of the logits tile).
BISECT_RANGE = 44.0
BISECT_ITERS = 26  # 44 / 2^26 ~ 6.6e-7: below f32 ulp of typical logits


def _tril_ones(n: int, strict: bool) -> jax.Array:
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where(r > c if strict else r >= c, 1.0, 0.0)


def _sample_kernel(k_ref, logits_ref, u_ref, out_ref):
    x = logits_ref[:].astype(jnp.float32)           # [TB, V]
    k = k_ref[0]
    tb, v = x.shape
    g = v // LANE

    row_max = jnp.max(x, axis=-1, keepdims=True)

    def threshold(x):
        # bisect within [row_max - BISECT_RANGE, row_max]: mass below that
        # window rounds to a zero f32 CDF increment (see BISECT_RANGE note),
        # so thresholds down there cannot change the sampling distribution —
        # and padding sentinels stay out of the search range
        lo = row_max - BISECT_RANGE
        hi = row_max + 1e-6

        def body(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            ge = jnp.sum((x >= mid).astype(jnp.float32), axis=-1,
                         keepdims=True)
            take = ge >= k
            return jnp.where(take, mid, lo), jnp.where(take, hi, mid)

        lo, hi = jax.lax.fori_loop(0, BISECT_ITERS, body, (lo, hi))
        return lo

    thr = jax.lax.cond(k < v, lambda: threshold(x),
                       lambda: jnp.min(x, axis=-1, keepdims=True))
    p = jnp.where(x >= thr, jnp.exp(x - row_max), 0.0)  # unnormalized mass

    # two-level prefix sums on the MXU (no cumsum primitive in Mosaic);
    # everything stays 2-D — Mosaic's vector layouts dislike 1-D/3-D here
    pb = p.reshape(tb * g, LANE)
    # intra[i, w] = sum_{v <= w} pb[i, v]
    intra = jnp.dot(pb, _tril_ones(LANE, strict=False).T,
                    preferred_element_type=jnp.float32)
    bs = intra[:, LANE - 1:LANE].reshape(tb, g)          # block sums [TB, G]
    excl = jnp.dot(bs, _tril_ones(g, strict=True).T,
                   preferred_element_type=jnp.float32)   # exclusive prefix
    # broadcast the per-block exclusive prefix across its lanes via a
    # constant expansion matrix E[gi, j] = (j // LANE == gi)
    blk_of_col = jax.lax.broadcasted_iota(jnp.int32, (g, v), 1) // LANE
    blk_row = jax.lax.broadcasted_iota(jnp.int32, (g, v), 0)
    expand = jnp.where(blk_row == blk_of_col, 1.0, 0.0)
    cdf = intra.reshape(tb, v) + jnp.dot(
        excl, expand, preferred_element_type=jnp.float32)  # [TB, V]

    total = jnp.sum(p, axis=1, keepdims=True)
    # clamp the draw strictly positive: u == 0.0 (p ~ 2^-23 per row) would
    # otherwise select index 0 even when token 0 was filtered out (cdf == 0
    # for every zero-mass prefix token)
    draw = jnp.maximum(u_ref[:].astype(jnp.float32) * total, 1e-30)  # [TB, 1]
    idx = jnp.sum((cdf < draw).astype(jnp.int32), axis=1, keepdims=True)
    out_ref[:] = jnp.minimum(idx, v - 1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=('interpret',))
def _sample_topk_2d(logits: jax.Array, u: jax.Array, k: jax.Array,
                    interpret: bool = False) -> jax.Array:
    n, v = logits.shape
    n_pad = _round_up(max(n, 8), TILE_B)
    v_pad = _round_up(v, LANE)
    if (n_pad, v_pad) == (n, v):
        x = logits.astype(jnp.float32)
        uu = u.reshape(n, 1).astype(jnp.float32)
    else:
        x = jnp.full((n_pad, v_pad), -1e10, jnp.float32).at[:n, :v].set(
            logits.astype(jnp.float32))
        # guarantee padded rows carry one positive-mass entry
        x = x.at[n:, 0].set(0.0)
        uu = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(u)

    out = pl.pallas_call(
        _sample_kernel,
        grid=(n_pad // TILE_B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_B, v_pad), lambda i: (i, 0)),
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_B, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * v_pad * (BISECT_ITERS + 2 * LANE),
            bytes_accessed=n_pad * v_pad * 4, transcendentals=n_pad * v_pad),
        interpret=interpret,
    )(jnp.asarray([k], jnp.int32), x, uu)
    return out[:n, 0]


def sample_topk_pallas(key: jax.Array, logits: jax.Array,
                       temperature: float = 1.0,
                       top_k=None, interpret: bool = False) -> jax.Array:
    """Drop-in fused replacement for
    `topk_topp.sample_from_logits(top_p=None)`. logits: [..., V] -> [...]."""
    shape = logits.shape[:-1]
    v = logits.shape[-1]
    flat = logits.reshape(-1, v).astype(jnp.float32) / temperature
    u = jax.random.uniform(key, (flat.shape[0],), jnp.float32)
    k = v if top_k is None else min(int(top_k), v)
    codes = _sample_topk_2d(flat, u, jnp.int32(k), interpret=interpret)
    return codes.reshape(shape)
