"""Pallas TPU kernel: fused single-token decode attention over a packed
KV cache.

The AR decode loop's attention is the spatial transformer's bottleneck
(measured 4.3 of 6.8 ms/step at flagship shapes, B=512 L12 d=1536): XLA
lowers the per-head einsums to thousands of tile-padded [1,64]x[64,64]
batched matvecs, and every step streams the whole static-shape cache from
HBM even when only `pos+1` rows are valid. This kernel fixes both:

* caches live in a PACKED all-heads layout [L, T, B, D]: the minor dims
  (B, D) are whole tiles, and the time dimension is untiled so both the
  chunked reads and the one-row write may use dynamic positions;
* the cache block is DMA'd HBM->VMEM in row chunks, and chunks beyond the
  valid prefix are SKIPPED (early steps read only what exists — the XLA
  path needed segment-growing scans to approximate this);
* per-head scores come from one MXU matmul: P = q (*) K elementwise, then
  P @ head_mask [D, nh] sums each head's slice (nh x the exact-attention
  FLOPs, trivial against the bandwidth saved); A V uses the transpose of
  the same trick. Math (f32 scores/softmax, bf16 AV) matches the XLA path.

Equivalent of the reference's cached sampling attention
(`hqvae/models/stage2/layers.py:93-123`).

Numerics: in f32 this path emits streams identical to the einsum path
(tested). In bf16 the P = q (*) K products round to bf16 before the f32
head-sum, where the MXU einsum accumulates unrounded — an ulp-level
difference of the same class as the reference's fp16-autocast sampling
vs its fp32 forward; per-seed determinism holds in both modes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e10
# cache-fetch granularity in time rows: bigger chunks mean fewer DMA issues
# (scalar-core issue cost dominates at large batch) but coarser prefix-skip
import os as _os
ROW_CHUNK = int(_os.environ.get('HQT_ATTN_ROW_CHUNK', '8'))
# batch-tile override for sweeps (0 = auto: largest of 32/64/16/8 dividing
# B; 32 measured fastest at flagship bf16 shapes — the int8 KV cache halves
# the DMA per tile, which can shift the optimum)
BLOCK_B = int(_os.environ.get('HQT_ATTN_BLOCK_B', '0'))


def _kernel(scalars_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref,
            y_ref, kc_out, vc_out, kS, vS, sems, psems, n_heads: int):
    """One (layer, position) decode-attention step, double-buffered over
    batch tiles.

    scalars: [2] int32 (layer, pos). q/kn/vn: [BT, D] VMEM blocks. kc/vc:
    full [L, T, B, D] refs in HBM (aliased in/out). kS/vS: [2, T, BT, D]
    VMEM scratch — while tile i computes from slot i%2, tile i+1's cache
    chunks stream into the other slot, hiding the HBM fetch behind compute
    (manual in-kernel DMAs are otherwise serial with the body).
    """
    layer = scalars_ref[0]
    pos = scalars_ref[1]
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    _, T, BT, D = kS.shape
    hd = D // n_heads
    n_chunks = T // ROW_CHUNK

    def fetch(tile, slot, op):
        """Start or wait the chunked prefix fetch of `tile` into `slot`.
        Chunks wholly at/beyond pos are never read: the new token is folded
        in analytically, the stale row pos gets weight exactly 0 from the
        strict t < pos mask, and V tails were zeroed in the prologue so
        0-weight rows stay finite (K garbage only feeds masked scores)."""
        b0 = pl.multiple_of(tile * BT, BT)
        for c in range(n_chunks):
            @pl.when(c * ROW_CHUNK < pos)
            def _():
                kcp = pltpu.make_async_copy(
                    kc_ref.at[layer, pl.ds(c * ROW_CHUNK, ROW_CHUNK),
                              pl.ds(b0, BT), :],
                    kS.at[slot, pl.ds(c * ROW_CHUNK, ROW_CHUNK)],
                    sems.at[slot, 0, c])
                vcp = pltpu.make_async_copy(
                    vc_ref.at[layer, pl.ds(c * ROW_CHUNK, ROW_CHUNK),
                              pl.ds(b0, BT), :],
                    vS.at[slot, pl.ds(c * ROW_CHUNK, ROW_CHUNK)],
                    sems.at[slot, 1, c])
                if op == 'start':
                    kcp.start()
                    vcp.start()
                else:
                    kcp.wait()
                    vcp.wait()

    @pl.when(i == 0)
    def _():
        # prologue: zero both slots' V tails once (scratch persists across
        # the sequential grid; fetches only ever write prefix chunks), and
        # kick off tile 0's fetch
        for slot in range(2):
            for c in range(n_chunks):
                @pl.when(c * ROW_CHUNK >= pos)
                def _():
                    vS[slot, c * ROW_CHUNK:(c + 1) * ROW_CHUNK] = jnp.zeros(
                        (ROW_CHUNK, BT, D), vS.dtype)
        fetch(0, 0, 'start')

    # persist the new row straight from the aligned input blocks (the time
    # index is an untiled dim of the [L, T, B, D] cache, so any pos works)
    b0 = pl.multiple_of(i * BT, BT)
    k_persist = pltpu.make_async_copy(
        kn_ref, kc_out.at[layer, pos, pl.ds(b0, BT), :], psems.at[0])
    v_persist = pltpu.make_async_copy(
        vn_ref, vc_out.at[layer, pos, pl.ds(b0, BT), :], psems.at[1])
    k_persist.start()
    v_persist.start()

    # head-slice selectors (both orientations built from iota — an in-kernel
    # transpose does not legalize): par[d, h] = parT[h, d] = (d // hd == h)
    par = (jax.lax.broadcasted_iota(jnp.int32, (D, n_heads), 0) // hd ==
           jax.lax.broadcasted_iota(jnp.int32, (D, n_heads), 1))
    parT = (jax.lax.broadcasted_iota(jnp.int32, (n_heads, D), 1) // hd ==
            jax.lax.broadcasted_iota(jnp.int32, (n_heads, D), 0))

    # int8 caches (per-channel-quantized KV): score/AV math runs in the q
    # dtype — K/V convert on read; the dequant scales are folded OUTSIDE the
    # kernel (K's into q, V's into the output), so the kernel stays
    # scale-free and the cache DMA is exactly half the bf16 bytes
    quant = kS.dtype == jnp.int8
    cdt = q_ref.dtype if quant else kS.dtype

    def compute(cur: int):
        """Attention for this tile from scratch slot `cur` (static)."""
        # prefetch the NEXT tile into the other slot, then wait for ours
        @pl.when(i + 1 < n_tiles)
        def _():
            fetch(i + 1, 1 - cur, 'start')
        fetch(i, cur, 'wait')

        scale = 1.0 / np.sqrt(hd)
        q = q_ref[:] * jnp.asarray(scale, q_ref.dtype)
        kSc, vSc = kS.at[cur], vS.at[cur]
        # per-head scores: elementwise q (*) K, head-sliced sums on the MXU
        P = q[None] * kSc[:].astype(cdt)                   # [T, BT, D]
        s = jnp.dot(P.reshape(T * BT, D), par.astype(P.dtype),
                    preferred_element_type=jnp.float32)    # [T*BT, nh]
        s = s.reshape(T, BT, n_heads)
        t_ids = jax.lax.broadcasted_iota(jnp.int32, (T, BT, n_heads), 0)
        s = jnp.where(t_ids < pos, s, NEG_INF)             # STRICT past mask
        # the new token's own score, computed off the input block directly
        s_new = jnp.dot((q * kn_ref[:].astype(cdt)).reshape(BT, D),
                        par.astype(q.dtype),
                        preferred_element_type=jnp.float32)  # [BT, nh]

        m = jnp.maximum(jnp.max(s, axis=0), s_new)         # [BT, nh]
        e = jnp.exp(s - m[None])                           # [T, BT, nh]
        e_new = jnp.exp(s_new - m)                         # [BT, nh]
        denom = jnp.sum(e, axis=0) + e_new                 # [BT, nh]
        att = e / denom[None]
        att_new = e_new / denom

        # AV: broadcast att across each head's slice (att @ par^T), multiply
        # by V in the compute dtype, accumulate f32 (the product rounding
        # matches the reference's fp16-autocast attention)
        A = jnp.dot(att.reshape(T * BT, n_heads).astype(cdt),
                    parT.astype(cdt),
                    preferred_element_type=jnp.float32
                    ).astype(cdt)                          # [T*BT, D]
        prod = (A.reshape(T, BT, D) * vSc[:].astype(cdt)
                ).astype(jnp.float32)
        y = jnp.sum(prod, axis=0)
        A_new = jnp.dot(att_new.astype(cdt), parT.astype(cdt),
                        preferred_element_type=jnp.float32).astype(cdt)
        y = y + (A_new * vn_ref[:].astype(cdt)).astype(jnp.float32)
        y_ref[:] = y.astype(y_ref.dtype)

    # static slot selection (dynamic vector loads at a traced leading index
    # do not legalize; duplicate the body under even/odd predicates)
    even = jax.lax.rem(i, 2) == 0

    @pl.when(even)
    def _():
        compute(0)

    @pl.when(jnp.logical_not(even))
    def _():
        compute(1)

    k_persist.wait()
    v_persist.wait()


@functools.partial(jax.jit,
                   static_argnames=('n_heads', 'block_b', 'interpret',
                                    't_compute'))
def decode_attention_step(q: jax.Array, k_new: jax.Array, v_new: jax.Array,
                          k_cache: jax.Array, v_cache: jax.Array,
                          layer, pos, n_heads: int,
                          block_b: int = 0, interpret: bool = False,
                          t_compute: int = 0
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """q/k_new/v_new: [B, D]; caches: [L, T, B, D] (updated in place via
    donation). Returns (y [B, D], k_cache', v_cache').
    block_b=0 picks the largest batch tile (<= 64) dividing B.

    `t_compute` (static, 0 = full T) bounds the kernel's score/AV compute
    and scratch to the first t_compute cache rows: the sampler allocates
    the FULL [L, T, B, D] cache once and shrinks only the per-segment
    compute (no segment-growth copies — the old pad-and-copy growth
    transiently held 1.5x the cache in HBM, the L42/bs512 OOM). Requires
    pos < t_compute; rows at/beyond t_compute are never read or written."""
    B, D = q.shape
    L, T, _, _ = k_cache.shape
    if block_b == 0 and BLOCK_B and B % BLOCK_B == 0:
        block_b = BLOCK_B
    if block_b == 0:
        # 32 measured fastest at flagship shapes (3.25 vs 3.57 ms/step @64)
        block_b = next((bb for bb in (32, 64, 16, 8) if B % bb == 0), None)
        if block_b is None:
            raise ValueError(
                f'packed decode attention needs batch divisible by 8, got '
                f'{B}; pad the batch or use attention="einsum"')
    T = t_compute or T
    assert T % ROW_CHUNK == 0 and T <= k_cache.shape[1], (T, k_cache.shape)
    assert B % block_b == 0, (B, block_b)
    scalars = jnp.stack([jnp.asarray(layer, jnp.int32),
                         jnp.asarray(pos, jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, D), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, D), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, D), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((block_b, D), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, T, block_b, D), k_cache.dtype),
            pltpu.VMEM((2, T, block_b, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2, T // ROW_CHUNK)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    if k_cache.dtype == jnp.int8:
        # int8 caches: the caller pre-quantizes the new K/V rows (per-channel
        # scales folded into q / the output outside this kernel); q keeps its
        # float dtype for the score/AV math
        assert k_new.dtype == jnp.int8 and v_new.dtype == jnp.int8, (
            'int8 KV cache needs pre-quantized k_new/v_new '
            f'(got {k_new.dtype}/{v_new.dtype})')
        q_in, kn_in, vn_in = q, k_new, v_new
    else:
        q_in = q.astype(k_cache.dtype)
        kn_in = k_new.astype(k_cache.dtype)
        vn_in = v_new.astype(v_cache.dtype)
    y, kc, vc = pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, D), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={4: 1, 5: 2},  # (incl. scalar arg) kc, vc
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scalars, q_in, kn_in, vn_in, k_cache, v_cache)
    return y.astype(q.dtype), kc, vc


def decode_attention_step_xla(q, k_new, v_new, k_cache, v_cache, layer, pos,
                              n_heads: int):
    """Reference XLA implementation of the same packed-cache step (CPU
    fallback and numerics oracle for the kernel test). Caches [L, T, B, D]."""
    B, D = q.shape
    hd = D // n_heads
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_new[None, None].astype(k_cache.dtype), (layer, pos, 0, 0))
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v_new[None, None].astype(v_cache.dtype), (layer, pos, 0, 0))
    T = k_cache.shape[1]
    kl = k_cache[layer].reshape(T, B, n_heads, hd)
    vl = v_cache[layer].reshape(T, B, n_heads, hd)
    qh = q.reshape(B, n_heads, hd)
    att = jnp.einsum('bhd,tbhd->bht', qh.astype(jnp.float32),
                     kl.astype(jnp.float32)) / np.sqrt(hd)
    att = jnp.where((jnp.arange(T) <= pos)[None, None, :], att, NEG_INF)
    att = jax.nn.softmax(att, axis=-1)
    y = jnp.einsum('bht,tbhd->bhd', att,
                   vl.astype(jnp.float32)).reshape(B, D)
    return y.astype(q.dtype), k_cache, v_cache
