"""Pallas TPU kernel: fused top-k-filtered categorical sampling.

Per decode step the sampler draws from softmax(logits/T) restricted to the
top-k logits (`hqvae/utils/sampling.py:105-109`). The XLA lowering is
latency-bound: a sort (or ~30 bisection kernels) for the k-th-value
threshold, a 10M-element PRNG for the Gumbel draw, softmax passes — each a
separate kernel launch per AR step. This kernel does the whole pipeline in
ONE launch with the logits row-tile resident in VMEM:

  1. per-row k-th-value threshold by bisection (on-chip fori loop, no
     launches; 26 fixed iterations). Rows that hit an exact count == k
     FREEZE their threshold (the bracket landed inside the v_k/v_{k+1}
     gap), which keeps the kept set exactly top-k; an early-exit
     while_loop variant exists behind HQT_SAMPLE_EARLY_EXIT=1 but measures
     the same as the fixed loop on v5e (the per-iteration scalar-cond sync
     costs what the skipped sweeps save), so the simple loop is default.
     The per-row >=mid counts are plain VPU lane reductions;
  2. masked exp (numerically shifted by the row max);
  3. inverse-CDF draw with a single precomputed uniform per row. Mosaic has
     no cumsum lowering, so the prefix sums are built from MXU matmuls:
     strict-lower-triangular ones over the 128-wide block sums for the
     exclusive block prefix, lower-triangular ones within each block.

The kernel takes logits in their COMPUTE dtype (bf16 model heads feed it
directly) and applies 1/temperature after an in-kernel f32 upcast — the
values match `logits.astype(f32) / T` bit-for-bit, and the bf16 path halves
the HBM traffic (no separate f32 cast/divide materialization between the
head gemm and the kernel).

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
# measured on v5e at [10240, 8192]: the early-exit while_loop (converged
# rows freeze; loop ends when all rows hit an exact count == k) times the
# SAME as the fixed 26-iteration fori loop — the per-iteration scalar-cond
# sync costs what the skipped sweeps save — so the simple loop is default
import os as _os
_EARLY_EXIT = _os.environ.get('HQT_SAMPLE_EARLY_EXIT', '0') == '1'
# 3-probe bisection: evaluate counts at the bracket's quartile points in
# ONE pass over the logits (the three compares share the tile load), so
# each pass narrows the bracket 4x — 13 passes reach the same 6.6e-7
# tolerance as 26 binary passes. Same kept-set guarantee (final lo lands
# in (v_{k+1}, v_k], exact count==k hits freeze a row early); trades ~1.5x
# more VPU compare/add work for HALF the per-pass fixed cost. A/B lever
# for the fused sampler's ~3.5 ms/step (scripts/ablate_ar.py). Measured
# e2e A/B on v5e (2026-08-18, flagship bs2048): 425.6 vs 428.1 samples/s
# — neutral-to-slightly-negative (the extra VPU work cancels the saved
# passes), so it stays opt-in and off by default.
_BISECT3 = _os.environ.get('HQT_SAMPLE_BISECT3', '0') == '1'
BISECT3_ITERS = 13  # 44 / 4^13 == 44 / 2^26


def _tril_ones(n: int, strict: bool) -> jax.Array:
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where(r > c if strict else r >= c, 1.0, 0.0)


def _dot_f32(a: jax.Array, b: jax.Array) -> jax.Array:
    """f32-accurate matmul in 2 MXU passes (vs 6 for Precision.HIGHEST):
    split the data operand into bf16 high + low halves; `b` here is always
    a 0/1 matrix, exactly representable in bf16, so the only error is the
    low half's bf16 rounding (~2^-16 relative — f32 class)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    return (jnp.dot(a_hi, bb, preferred_element_type=jnp.float32) +
            jnp.dot(a_lo, bb, preferred_element_type=jnp.float32))


def _sample_kernel(k_ref, temp_ref, logits_ref, u_ref, out_ref,
                   bisect3: bool = False):
    x = logits_ref[:].astype(jnp.float32) / temp_ref[0]   # [TB, V]
    k = k_ref[0]
    tb, v = x.shape
    g = v // LANE

    def count_ge(mid):
        return jnp.sum((x >= mid).astype(jnp.float32), axis=-1,
                       keepdims=True)

    row_max = jnp.max(x, axis=-1, keepdims=True)

    def threshold3():
        # 3 probes at the bracket quartiles per pass (see _BISECT3 note):
        # bracket narrows 4x/pass, same invariant and freeze rule as the
        # binary loop — counts are monotone (c1 >= c2 >= c3), so the
        # tightest [m_i, m_j] with count(>=m_i) >= k > count(>=m_j) is
        # picked by cascaded selects, and an exact count == k at any probe
        # lands lo on that probe (the largest such) and freezes the row.
        kf = k.astype(jnp.float32)

        def body(_, st):
            lo, hi, done = st
            live = done < 0.5
            d = hi - lo
            m1 = lo + 0.25 * d
            m2 = lo + 0.5 * d
            m3 = lo + 0.75 * d
            c1 = count_ge(m1)
            c2 = count_ge(m2)
            c3 = count_ge(m3)
            lo2 = jnp.where(c1 >= kf, m1, lo)
            lo2 = jnp.where(c2 >= kf, m2, lo2)
            lo2 = jnp.where(c3 >= kf, m3, lo2)
            hi2 = jnp.where(c3 < kf, m3, hi)
            hi2 = jnp.where(c2 < kf, m2, hi2)
            hi2 = jnp.where(c1 < kf, m1, hi2)
            lo = jnp.where(live, lo2, lo)
            hi = jnp.where(live, hi2, hi)
            exact = jnp.logical_or(jnp.logical_or(c1 == kf, c2 == kf),
                                   c3 == kf)
            done = jnp.where(jnp.logical_and(exact, live),
                             jnp.ones_like(done), done)
            return lo, hi, done

        lo, _, _ = jax.lax.fori_loop(
            0, BISECT3_ITERS, body,
            (row_max - BISECT_RANGE, row_max + 1e-6,
             jnp.zeros((tb, 1), jnp.float32)))
        return lo

    def threshold():
        # bisect within [row_max - BISECT_RANGE, row_max] (see BISECT_RANGE
        # note; padding sentinels stay out of the search range). Invariant:
        # count(>= lo) >= k > count(>= hi). A row is DONE when a mid with
        # count == k is found (exact threshold, no ties) — its bracket is
        # frozen; with ties at v_k the count jumps over k and the row runs
        # to the full tolerance, reproducing top-k-with-ties.
        kf = k.astype(jnp.float32)

        def cond(state):
            i, all_done, lo, hi, done = state
            return jnp.logical_and(i < BISECT_ITERS, all_done < 0.5)

        def body(state):
            i, _, lo, hi, done = state
            mid = 0.5 * (lo + hi)
            ge = count_ge(mid)
            live = done < 0.5
            take = jnp.logical_and(ge >= kf, live)
            drop = jnp.logical_and(ge < kf, live)
            lo = jnp.where(take, mid, lo)
            hi = jnp.where(drop, mid, hi)
            done = jnp.where(jnp.logical_and(take, ge == kf),
                             jnp.ones_like(done), done)
            return i + 1, jnp.min(done), lo, hi, done

        state = (jnp.asarray(0, jnp.int32), jnp.asarray(0.0, jnp.float32),
                 row_max - BISECT_RANGE, row_max + 1e-6,
                 jnp.zeros((tb, 1), jnp.float32))
        if _EARLY_EXIT:
            _, _, lo, _, _ = jax.lax.while_loop(cond, body, state)
        else:
            def fbody(_, st):
                return body(st)
            _, _, lo, _, _ = jax.lax.fori_loop(0, BISECT_ITERS, fbody, state)
        return lo

    thr = jax.lax.cond(k < v, threshold3 if bisect3 else threshold,
                       lambda: jnp.min(x, axis=-1, keepdims=True))
    p = jnp.where(x >= thr, jnp.exp(x - row_max), 0.0)  # unnormalized mass

    # two-level prefix sums on the MXU (no cumsum primitive in Mosaic);
    # everything stays 2-D — Mosaic's vector layouts dislike 1-D/3-D here.
    # _dot_f32 keeps the increments f32-accurate: the MXU's default f32
    # path rounds operands to bf16 (~2^-9 relative), visibly perturbing
    # the categorical probabilities
    pb = p.reshape(tb * g, LANE)
    # intra[i, w] = sum_{v <= w} pb[i, v]
    intra = _dot_f32(pb, _tril_ones(LANE, strict=False).T)
    bs = intra[:, LANE - 1:LANE].reshape(tb, g)          # block sums [TB, G]
    excl = _dot_f32(bs, _tril_ones(g, strict=True).T)    # exclusive prefix
    # broadcast the per-block exclusive prefix across its lanes via a
    # constant expansion matrix E[gi, j] = (j // LANE == gi)
    blk_of_col = jax.lax.broadcasted_iota(jnp.int32, (g, v), 1) // LANE
    blk_row = jax.lax.broadcasted_iota(jnp.int32, (g, v), 0)
    expand = jnp.where(blk_row == blk_of_col, 1.0, 0.0)
    cdf = intra.reshape(tb, v) + _dot_f32(excl, expand)   # [TB, V]

    # total mass = last CDF entry (the same sum in the two-level order)
    total = cdf[:, v - 1:v]
    # clamp the draw strictly positive: u == 0.0 (p ~ 2^-23 per row) would
    # otherwise land before the first positive-mass token
    draw = jnp.maximum(u_ref[:].astype(jnp.float32) * total, 1e-30)  # [TB, 1]
    # crossing index: first j with cdf[j] >= draw (count formulation —
    # tokens whose tiny mass rounds to a zero f32 cdf increment correctly
    # never win, matching the single-accumulator inverse-CDF), then snap
    # DOWN to the nearest positive-mass token: f32 rounding can make the
    # two-level cdf locally non-monotone at a block boundary (observed
    # on-chip), letting the count land on a FILTERED token in the
    # rounding-sliver of the draw space — kept-set membership must be
    # structural, not a rounding property.
    idx0 = jnp.sum((cdf < draw).astype(jnp.int32), axis=-1,
                   keepdims=True)                           # [TB, 1]
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (tb, v), 1)
    valid = jnp.logical_and(p > 0.0, iota_v <= idx0)
    # every row has mass at its argmax and cdf == 0 before the first mass
    # token, so idx0 >= first-valid and the max below is well-defined
    out_ref[:] = jnp.max(jnp.where(valid, iota_v, 0), axis=-1,
                         keepdims=True)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=('interpret', 'bisect3'))
def _sample_topk_2d(logits: jax.Array, u: jax.Array, k: jax.Array,
                    temperature: jax.Array,
                    interpret: bool = False,
                    bisect3: bool = False) -> jax.Array:
    n, v = logits.shape
    n_pad = _round_up(max(n, 8), TILE_B)
    v_pad = _round_up(v, LANE)
    if (n_pad, v_pad) == (n, v):
        x = logits
        uu = u.reshape(n, 1).astype(jnp.float32)
    else:
        x = jnp.full((n_pad, v_pad), -1e10, logits.dtype).at[:n, :v].set(
            logits)
        # guarantee padded rows carry one positive-mass entry
        x = x.at[n:, 0].set(0.0)
        uu = jnp.zeros((n_pad, 1), jnp.float32).at[:n, 0].set(u)

    out = pl.pallas_call(
        functools.partial(_sample_kernel, bisect3=bisect3),
        grid=(n_pad // TILE_B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_B, v_pad), lambda i: (i, 0)),
            pl.BlockSpec((TILE_B, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_B, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=n_pad * v_pad * (BISECT_ITERS + 2 * LANE),
            bytes_accessed=n_pad * v_pad * 4, transcendentals=n_pad * v_pad),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray([k], jnp.int32), jnp.asarray([temperature], jnp.float32),
      x, uu)
    return out[:n, 0]


def sample_topk_pallas(key: jax.Array, logits: jax.Array,
                       temperature: float = 1.0,
                       top_k=None, interpret: bool = False,
                       bisect3=None) -> jax.Array:
    """Drop-in fused replacement for
    `topk_topp.sample_from_logits(top_p=None)`. logits: [..., V] (any float
    dtype — fed to the kernel unconverted) -> [...].

    Support caveat: with top_k=None the kernel still bisects (k = real vocab
    < padded tile), so sampling support is windowed to
    [row_max - BISECT_RANGE, row_max] — logits more than 44 below the max
    (probability < ~8e-20 of the max's) are truncated. Bit-parity with the
    XLA `sample_from_logits` is guaranteed for the kept-set/top-k semantics,
    not for arbitrary tail mass of a full softmax."""
    shape = logits.shape[:-1]
    v = logits.shape[-1]
    flat = logits.reshape(-1, v)
    u = jax.random.uniform(key, (flat.shape[0],), jnp.float32)
    k = v if top_k is None else min(int(top_k), v)
    if bisect3 is None:
        bisect3 = _BISECT3
    codes = _sample_topk_2d(flat, u, jnp.int32(k),
                            jnp.float32(temperature), interpret=interpret,
                            bisect3=bisect3)
    return codes.reshape(shape)
