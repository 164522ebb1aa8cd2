"""Sampling engine: jit-compiled `lax.scan` decode loops for every stage-2
model family.

TPU re-design of the reference's python decode loops
(`hqvae/utils/sampling.py:55-307`): where the reference iterates 64 spatial
steps in python, stacking ever-growing `past` tensors and re-launching CUDA
kernels per step, here the whole generation — embedding, KV-cached attention,
depth mini-decode, temperature/top-k/top-p filtering and categorical draws —
is ONE compiled XLA program: a `lax.scan` over spatial positions with a
preallocated static-shape KV cache, fully on-device RNG (`jax.random`), and
the 2-3 depth iterations unrolled inside the scan body.

RNG discipline (differs from torch, documented): one `jax.random` key per
sampler call, split deterministically per step and per token draw in the
reference's draw order (top first, then bottom positions 0..r-1). Fixed seed
=> bit-identical token streams across runs/hosts on the same topology.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.stage2.hierarchical import HierarchicalGPT
from ..models.stage2.layers import kv_cache_shape
from ..ops.topk_topp import sample_from_logits


@dataclass(frozen=True)
class SamplingParams:
    """Per-level filtering knobs (`sampling_hqmodel.py:28-32`,
    `hierarchical_ar.py:434-439`)."""
    top_k_top: Optional[int] = None
    top_p_top: Optional[float] = None
    top_k_bot: Optional[int] = None
    top_p_bot: Optional[float] = None
    temperature_top: float = 1.0
    temperature_bot: float = 1.0


def _depth_sample_parallel(model: HierarchicalGPT, variables, h, key,
                           sp: SamplingParams,
                           given_top: Optional[jax.Array] = None):
    """Depth decode, 'parallel' mode (`hierarchical_ar.py:721-789`):
    iteration 0 samples the top code; iterations 1..len_seq_depth-1 sample
    groups of num_bottom_pred bottom codes in parallel. h: [B, D]."""
    r = model.ratio_bot2top
    n = model.num_bottom_pred
    n_groups = r // n

    logits_top, kv = model.apply(variables, h,
                                 method=HierarchicalGPT.depth_first_logits)
    key, k_top = jax.random.split(key)
    top = sample_from_logits(k_top, logits_top,
                             temperature=sp.temperature_top,
                             top_k=sp.top_k_top, top_p=sp.top_p_top)
    if given_top is not None:
        top = given_top
    bots = []
    prev_codes = top[:, None]  # [B, 1]
    from ..models.stage2.layers import int8_stage2_scope
    for g in range(1, n_groups + 1):
        # the depth-second chain is the int8_stage2_scope hot path: under
        # HQT_INT8_STAGE2=1 with calibrated scales its gemms run A8W8
        with int8_stage2_scope():
            logits_bot, kv = model.apply(
                variables, prev_codes, kv, g,
                method=HierarchicalGPT.depth_second_logits)  # [B, n, Vb]
        # one batched filtered-categorical draw for the whole group (the n
        # positions are conditionally independent given the top code)
        key, kg = jax.random.split(key)
        group = sample_from_logits(kg, logits_bot,
                                   temperature=sp.temperature_bot,
                                   top_k=sp.top_k_bot, top_p=sp.top_p_bot)
        bots.append(group)
        # reference quirk: next group is conditioned on these codes through
        # tok_emb_top_depth (`hierarchical_ar.py:697-701`)
        prev_codes = group
    return top, jnp.concatenate(bots, axis=1)  # [B], [B, r]


def _depth_sample_bidirectional(model: HierarchicalGPT, variables, h, key,
                                sp: SamplingParams,
                                given_top: Optional[jax.Array] = None):
    """Single-pass bidirectional depth decode. Reference quirk: every
    position (including top) is filtered with top_k_bot/top_p_bot and
    temperature_top (`hierarchical_ar.py:861-874`)."""
    logits_top, logits_bot = model.apply(
        variables, h, method=HierarchicalGPT.depth_bidirectional)
    logits = jnp.concatenate([logits_top, logits_bot], axis=1)
    # one batched filtered-categorical draw over all 1+r positions (they
    # are conditionally independent given h, and share the same knobs)
    key, kd = jax.random.split(key)
    outs = sample_from_logits(kd, logits, temperature=sp.temperature_top,
                              top_k=sp.top_k_bot, top_p=sp.top_p_bot)
    top = outs[:, 0]
    if given_top is not None:
        top = given_top
    return top, outs[:, 1:]


def _depth_sample_top2bot(model: HierarchicalGPT, variables, h, key,
                          sp: SamplingParams,
                          given_top: Optional[jax.Array] = None):
    """Fully-causal depth decode (`hierarchical_ar.py:613-664`):
    len_seq_depth single-token steps through the depth stack."""
    B = h.shape[0]
    hpd = model.hpd
    n_layers_d = hpd.n_layers
    n_heads = hpd.n_heads
    hd = hpd.embed_dim // n_heads
    T = model.len_seq_depth
    kc = jnp.zeros((n_layers_d, B, n_heads, T, hd), h.dtype)
    vc = jnp.zeros_like(kc)

    def run_step(x, kc, vc, cache_len):
        return model.apply(variables, x, kc, vc, cache_len,
                           method=HierarchicalGPT.depth_causal_step)

    sos_depth = model.apply(variables,
                            method=lambda m: m.sos_depth)
    x = h[:, None, :] + sos_depth
    x, kc, vc = run_step(x, kc, vc, 0)
    logits = _head(model, variables, 'top', x[:, 0])
    key, k0 = jax.random.split(key)
    top = sample_from_logits(k0, logits, temperature=sp.temperature_top,
                             top_k=sp.top_k_top, top_p=sp.top_p_top)
    if given_top is not None:
        top = given_top

    codes = [top]
    for cnt in range(1, T):
        prev = codes[-1]
        if cnt == 1:
            emb = model.apply(variables, prev,
                              method=lambda m, c: m.tok_emb_top_depth(c))
        else:
            emb = model.apply(variables, prev,
                              method=lambda m, c: m.tok_emb_bot_depth(c))
        pos = model.apply(
            variables, jnp.full((B,), cnt - 1, jnp.int32),
            method=lambda m, p: m.pos_emb_depth(p))
        x = (emb + pos)[:, None, :]
        x, kc, vc = run_step(x, kc, vc, cnt)
        logits = _head(model, variables, 'bot', x[:, 0])
        key, kc_ = jax.random.split(key)
        codes.append(sample_from_logits(
            kc_, logits, temperature=sp.temperature_bot,
            top_k=sp.top_k_bot, top_p=sp.top_p_bot))
    return codes[0], jnp.stack(codes[1:], axis=1)


def _head(model, variables, which, x):
    if which == 'top':
        return model.apply(variables, x,
                           method=lambda m, v: m.head_top(m.ln_top(v)))
    return model.apply(variables, x,
                       method=lambda m, v: m.head_bot(m.ln_bot(v)))


_DEPTH_SAMPLERS = {
    'parallel': _depth_sample_parallel,
    'bidirectional': _depth_sample_bidirectional,
    'top2bot': _depth_sample_top2bot,
}


def _use_packed_cache(attention: str, embed_dim: int, batch: int) -> bool:
    """Packed [L, T, B, D] caches + the fused Pallas decode-attention kernel
    (ops/pallas_attention.py). 'auto' enables it on TPU backends when the
    kernel's tiling fits (D a whole number of lanes, B a multiple of 8)."""
    if attention == 'packed':
        return True
    if attention == 'einsum':
        return False
    assert attention == 'auto', attention
    return (jax.default_backend() == 'tpu' and embed_dim % 128 == 0
            and batch % 8 == 0)


def make_hierarchical_sampler(model: HierarchicalGPT,
                              max_seq_len: int = 64,
                              params: SamplingParams = SamplingParams(),
                              use_given_top: bool = False,
                              cache_dtype=None,
                              n_segments: int = 2,
                              attention: str = 'auto',
                              _return_caches: bool = False):
    """Build a jitted sampler for the 2-level model.

    Returns fn(variables, key, labels[, given_top_codes])
      -> (codes_t [B, max_seq_len], codes_b [B, max_seq_len, ratio]).

    `labels`: [B] int class ids (cls-cond), [B, ctx_len_txt] token ids
    (txt-cond), or [B] dummy (uncond — only the batch size is used).
    Equivalent of `sampling_ihqgpt` (`hqvae/utils/sampling.py:164-237`).

    `n_segments` splits the scan into segments with growing static cache
    sizes. On the einsum path every step's attention reads the whole
    (static-shape) cache, so segments cut HBM traffic; on the packed
    Pallas path the kernel already DMA-skips the invalid tail, but its
    score/AV COMPUTE covers all T rows (static shapes) — segments shrink
    that too (measured: attention-only 10.4 -> ~7 ms/step at B=2048 with 4
    segments).
    """
    depth_fn = _DEPTH_SAMPLERS[model.depth_mode]
    hp = model.hparams
    n_heads = hp.n_heads
    hd = hp.embed_dim // n_heads
    n_layers = hp.n_layers
    sos_len = hp.ctx_len_txt if model.use_txt_cond else 1

    # segment boundaries over spatial steps [1, max_seq_len)
    bounds = []
    prev = 1
    for si in range(n_segments):
        end = max_seq_len * (si + 1) // n_segments if si < n_segments - 1 \
            else max_seq_len
        if end > prev:
            bounds.append((prev, end))
            prev = end
    if not bounds:
        bounds = [(1, max_seq_len)]

    def sample(variables, key, labels, given_top_codes=None):
        import contextlib
        import os

        from ..models.stage2.layers import int8_stage2_scope

        # HQT_INT8_SPATIAL=1 extends the A8W8 gemms to the SPATIAL
        # transformer steps as well (still gated per-Dense by
        # HQT_INT8_STAGE2=1 + calibrated scales); read at trace time
        spatial_scope = (int8_stage2_scope
                         if os.environ.get('HQT_INT8_SPATIAL') == '1'
                         else contextlib.nullcontext)

        B = labels.shape[0]
        packed = _use_packed_cache(attention, hp.embed_dim, B)
        seg_bounds = bounds
        sos = model.apply(variables, B, labels,
                          method=HierarchicalGPT.sos_tokens)
        cdtype = cache_dtype or sos.dtype
        if cdtype == jnp.int8:
            # int8 KV cache: quantized write + scale-folded dequant live
            # only on the packed path (layers._PackedStepMixin)
            assert packed, ("int8 KV caches need the packed cache layout; "
                            "pass attention='packed' (the 'auto' heuristic "
                            "declined it for this backend/shape)")
        t0_max = sos_len + seg_bounds[0][1] - 1

        def packed_t(t):
            # round up to the kernel's DMA row chunk
            from ..ops.pallas_attention import ROW_CHUNK
            return -(-t // ROW_CHUNK) * ROW_CHUNK

        if packed:
            # [L, T, B, D], allocated at the FULL final size once. The
            # kernel DMA-fetches only the valid prefix, and its VPU/MXU
            # score+AV work is bounded per segment by the static
            # `t_compute` — segments shrink the compute and the VMEM
            # scratch WITHOUT per-segment cache reallocations (the old
            # pad-and-copy growth transiently held 1.5x the cache in HBM:
            # the L42/bs512 OOM).
            kc = jnp.zeros((n_layers,
                            packed_t(sos_len + max_seq_len - 1), B,
                            hp.embed_dim), cdtype)
        else:
            kc = jnp.zeros(kv_cache_shape(n_layers, B, n_heads, t0_max,
                                          hd), cdtype)
        vc = jnp.zeros_like(kc)

        # prefill conditioning prefix (`hierarchical_ar.py:493-504`)
        with spatial_scope():
            h_all, kc, vc = model.apply(variables, sos, kc, vc, 0,
                                        method=HierarchicalGPT.spatial_step)
        key, k0 = jax.random.split(key)
        g0 = given_top_codes[:, 0] if use_given_top else None
        top0, bot0 = depth_fn(model, variables, h_all[:, -1], k0, params,
                              given_top=g0)

        def make_body(t_compute):
            def body(carry, step):
                kc, vc, prev_top, prev_bot, key = carry
                i = step  # spatial index 1..max_seq_len-1
                x = model.apply(variables, prev_top, prev_bot,
                                jnp.full((B,), i - 1, jnp.int32),
                                method=HierarchicalGPT.embed_cell_step)
                with spatial_scope():
                    h, kc, vc = model.apply(
                        variables, x, kc, vc, sos_len + i - 1,
                        method=HierarchicalGPT.spatial_step,
                        t_compute=t_compute)
                key, ki = jax.random.split(key)
                gi = given_top_codes[:, i] if use_given_top else None
                top_i, bot_i = depth_fn(model, variables, h[:, -1], ki,
                                        params, given_top=gi)
                return (kc, vc, top_i, bot_i, key), (top_i, bot_i)
            return body

        carry = (kc, vc, top0, bot0, key)
        all_tops, all_bots = [], []
        for seg_i, (lo, hi) in enumerate(seg_bounds):
            if seg_i > 0 and not packed:
                # einsum path: grow the cache to this segment's static size
                # (every step reads the whole cache, so smaller segments cut
                # HBM traffic; the packed kernel instead bounds compute via
                # t_compute against the one full-size cache)
                kc, vc, pt, pb, key = carry
                seg_t = sos_len + hi - 1
                kc_big = jnp.zeros(kv_cache_shape(
                    n_layers, B, n_heads, seg_t, hd), cdtype)
                vc_big = jnp.zeros_like(kc_big)
                kc_big = jax.lax.dynamic_update_slice(
                    kc_big, kc, (0, 0, 0, 0, 0))
                vc_big = jax.lax.dynamic_update_slice(
                    vc_big, vc, (0, 0, 0, 0, 0))
                carry = (kc_big, vc_big, pt, pb, key)
            body = make_body(packed_t(sos_len + hi - 1) if packed else 0)
            carry, (tops, bots) = jax.lax.scan(body, carry,
                                               jnp.arange(lo, hi))
            all_tops.append(tops)
            all_bots.append(bots)

        tops = jnp.concatenate(all_tops, axis=0)
        bots = jnp.concatenate(all_bots, axis=0)
        codes_t = jnp.concatenate([top0[:, None], tops.T], axis=1)
        codes_b = jnp.concatenate([bot0[:, None, :],
                                   bots.transpose(1, 0, 2)], axis=1)
        if _return_caches:
            # calibration hook: the final KV caches hold every K/V row the
            # run produced (twostage.calibrate_kv_scales reduces them to
            # per-channel int8 scales)
            return (codes_t, codes_b), (carry[0], carry[1])
        return codes_t, codes_b

    return jax.jit(sample)


def make_hierarchical_scorer(model: HierarchicalGPT,
                             max_seq_len: int = 64,
                             cache_dtype=None,
                             n_segments: int = 2,
                             attention: str = 'auto'):
    """Teacher-forced per-step logits through the SERVING decode path.

    Returns fn(variables, labels, codes_t [B, L], codes_b_cells [B, L, r])
      -> (logits_top [B, L, Vt], logits_bot [B, L, r, Vb]).

    Mathematically this equals the training forward (`hierarchical_ar.py:
    246-426`), but it is computed through the exact serving machinery the
    sampler uses — prefill, packed/einsum KV-cache spatial steps, the
    depth-first/second chain, and (when enabled) the int8 KV cache and the
    scoped A8W8 gemms — so differences between two serving modes' outputs
    measure the true serving-path numerics (per-step logit KL), including
    errors the training forward never sees (e.g. int8 KV rounding).

    Depth mode 'parallel' only (the released-checkpoint family).
    """
    assert model.depth_mode == 'parallel', model.depth_mode
    hp = model.hparams
    n_heads = hp.n_heads
    hd = hp.embed_dim // n_heads
    n_layers = hp.n_layers
    sos_len = hp.ctx_len_txt if model.use_txt_cond else 1
    r = model.ratio_bot2top
    n = model.num_bottom_pred
    n_groups = r // n

    bounds = []
    prev = 1
    for si in range(n_segments):
        end = max_seq_len * (si + 1) // n_segments if si < n_segments - 1 \
            else max_seq_len
        if end > prev:
            bounds.append((prev, end))
            prev = end
    if not bounds:
        bounds = [(1, max_seq_len)]

    def score(variables, labels, codes_t, codes_b_cells):
        import contextlib
        import os

        from ..models.stage2.layers import int8_stage2_scope

        spatial_scope = (int8_stage2_scope
                         if os.environ.get('HQT_INT8_SPATIAL') == '1'
                         else contextlib.nullcontext)

        def depth_logits(h, ct_i, cb_i):
            """h: [B, D]; ct_i: [B]; cb_i: [B, r] (local raster order).
            Teacher-forced mirror of _depth_sample_parallel."""
            logits_top, kv = model.apply(
                variables, h, method=HierarchicalGPT.depth_first_logits)
            prev_codes = ct_i[:, None]
            lbs = []
            for g in range(1, n_groups + 1):
                with int8_stage2_scope():
                    lb, kv = model.apply(
                        variables, prev_codes, kv, g,
                        method=HierarchicalGPT.depth_second_logits)
                lbs.append(lb)
                prev_codes = cb_i[:, (g - 1) * n:g * n]
            return logits_top, jnp.concatenate(lbs, axis=1)  # [B,Vt],[B,r,Vb]

        B = labels.shape[0]
        packed = _use_packed_cache(attention, hp.embed_dim, B)
        sos = model.apply(variables, B, labels,
                          method=HierarchicalGPT.sos_tokens)
        cdtype = cache_dtype or sos.dtype
        if cdtype == jnp.int8:
            assert packed, "int8 KV caches need the packed cache layout"

        def packed_t(t):
            from ..ops.pallas_attention import ROW_CHUNK
            return -(-t // ROW_CHUNK) * ROW_CHUNK

        if packed:
            kc = jnp.zeros((n_layers,
                            packed_t(sos_len + max_seq_len - 1), B,
                            hp.embed_dim), cdtype)
        else:
            kc = jnp.zeros(kv_cache_shape(
                n_layers, B, n_heads, sos_len + bounds[0][1] - 1, hd),
                cdtype)
        vc = jnp.zeros_like(kc)

        with spatial_scope():
            h_all, kc, vc = model.apply(variables, sos, kc, vc, 0,
                                        method=HierarchicalGPT.spatial_step)
        lt0, lb0 = depth_logits(h_all[:, -1], codes_t[:, 0],
                                codes_b_cells[:, 0])

        def make_body(t_compute):
            def body(carry, i):
                kc, vc = carry
                x = model.apply(variables, codes_t[:, i - 1],
                                codes_b_cells[:, i - 1],
                                jnp.full((B,), i - 1, jnp.int32),
                                method=HierarchicalGPT.embed_cell_step)
                with spatial_scope():
                    h, kc, vc = model.apply(
                        variables, x, kc, vc, sos_len + i - 1,
                        method=HierarchicalGPT.spatial_step,
                        t_compute=t_compute)
                lt, lb = depth_logits(h[:, -1], codes_t[:, i],
                                      codes_b_cells[:, i])
                return (kc, vc), (lt, lb)
            return body

        carry = (kc, vc)
        all_lt, all_lb = [lt0[:, None]], [lb0[:, None]]
        for seg_i, (lo, hi) in enumerate(bounds):
            if seg_i > 0 and not packed:
                kc, vc = carry
                seg_t = sos_len + hi - 1
                kc_big = jnp.zeros(kv_cache_shape(
                    n_layers, B, n_heads, seg_t, hd), cdtype)
                vc_big = jnp.zeros_like(kc_big)
                kc_big = jax.lax.dynamic_update_slice(
                    kc_big, kc, (0, 0, 0, 0, 0))
                vc_big = jax.lax.dynamic_update_slice(
                    vc_big, vc, (0, 0, 0, 0, 0))
                carry = (kc_big, vc_big)
            body = make_body(packed_t(sos_len + hi - 1) if packed else 0)
            carry, (lts, lbs) = jax.lax.scan(body, carry,
                                             jnp.arange(lo, hi))
            all_lt.append(jnp.moveaxis(lts, 0, 1))   # [B, hi-lo, Vt]
            all_lb.append(jnp.moveaxis(lbs, 0, 1))   # [B, hi-lo, r, Vb]
        return (jnp.concatenate(all_lt, axis=1),
                jnp.concatenate(all_lb, axis=1))

    return jax.jit(score)


def make_igpt_sampler(model, max_seq_len: int = 256,
                      top_k: Optional[int] = None,
                      top_p: Optional[float] = None,
                      temperature: float = 1.0,
                      cache_dtype=None,
                      attention: str = 'auto'):
    """Jitted sampler for the flat iGPT baseline (`sampling_igpt`,
    `hqvae/utils/sampling.py:116-161`). Returns fn(variables, key, labels)
    -> codes [B, max_seq_len]."""
    hp = model.hparams
    n_heads, n_layers = hp.n_heads, hp.n_layers
    hd = hp.embed_dim // n_heads

    def sample(variables, key, labels):
        B = labels.shape[0]
        sos = model.apply(variables, B, labels, method=type(model).sos_tokens)
        t_max = max_seq_len
        cdtype = cache_dtype or sos.dtype
        if _use_packed_cache(attention, hp.embed_dim, B):
            from ..ops.pallas_attention import ROW_CHUNK
            kc = jnp.zeros((n_layers, -(-t_max // ROW_CHUNK) * ROW_CHUNK,
                            B, hp.embed_dim), cdtype)
        else:
            kc = jnp.zeros(kv_cache_shape(n_layers, B, n_heads, t_max, hd),
                           cdtype)
        vc = jnp.zeros_like(kc)
        logits, kc, vc = model.apply(variables, sos, kc, vc, 0,
                                     method=type(model).decode_step)
        key, k0 = jax.random.split(key)
        code0 = sample_from_logits(k0, logits, temperature=temperature,
                                   top_k=top_k, top_p=top_p)

        def body(carry, i):
            kc, vc, prev, key = carry
            x = model.apply(variables, prev,
                            jnp.full((B,), i - 1, jnp.int32),
                            method=type(model).embed_step)
            logits, kc, vc = model.apply(variables, x, kc, vc, i,
                                         method=type(model).decode_step)
            key, ki = jax.random.split(key)
            code = sample_from_logits(ki, logits, temperature=temperature,
                                      top_k=top_k, top_p=top_p)
            return (kc, vc, code, key), code

        (_, _, _, _), codes = jax.lax.scan(
            body, (kc, vc, code0, key), jnp.arange(1, max_seq_len))
        return jnp.concatenate([code0[:, None], codes.T], axis=1)

    return jax.jit(sample)


def make_txt2img_sampler(model, max_seq_len: int = 256,
                         top_k: Optional[int] = None,
                         top_p: Optional[float] = None,
                         temperature: float = 1.0,
                         cache_dtype=None,
                         attention: str = 'auto'):
    """Jitted sampler for Transformer1d text->image (`sampling`,
    `hqvae/utils/sampling.py:55-113`). fn(variables, key, texts [B, N])
    -> codes [B, max_seq_len]."""
    hp = model.hparams
    n_heads, n_layers = hp.n_heads, hp.n_layers
    hd = hp.embed_dim // n_heads

    def sample(variables, key, texts):
        B, N = texts.shape
        x = model.apply(variables, texts, method=type(model).embed_texts)
        t_max = N + max_seq_len
        cdtype = cache_dtype or x.dtype
        if _use_packed_cache(attention, hp.embed_dim, B):
            from ..ops.pallas_attention import ROW_CHUNK
            kc = jnp.zeros((n_layers, -(-t_max // ROW_CHUNK) * ROW_CHUNK,
                            B, hp.embed_dim), cdtype)
        else:
            kc = jnp.zeros(kv_cache_shape(n_layers, B, n_heads, t_max, hd),
                           cdtype)
        vc = jnp.zeros_like(kc)
        logits, kc, vc = model.apply(variables, x, kc, vc, 0,
                                     method=type(model).decode_step)
        key, k0 = jax.random.split(key)
        code0 = sample_from_logits(k0, logits, temperature=temperature,
                                   top_k=top_k, top_p=top_p)

        def body(carry, i):
            kc, vc, prev, key = carry
            x = model.apply(variables, prev,
                            jnp.full((B,), i - 1, jnp.int32),
                            method=type(model).embed_step)
            logits, kc, vc = model.apply(variables, x, kc, vc, N + i - 1,
                                         method=type(model).decode_step)
            key, ki = jax.random.split(key)
            code = sample_from_logits(ki, logits, temperature=temperature,
                                      top_k=top_k, top_p=top_p)
            return (kc, vc, code, key), code

        (_, _, _, _), codes = jax.lax.scan(
            body, (kc, vc, code0, key), jnp.arange(1, max_seq_len))
        return jnp.concatenate([code0[:, None], codes.T], axis=1)

    return jax.jit(sample)


def make_multilevel_sampler(model, max_seq_len: int = 64,
                            top_k=(None, None, None),
                            top_p=(None, None, None),
                            temperature=(1.0, 1.0, 1.0),
                            cache_dtype=None,
                            n_segments: int = 1,
                            attention: str = 'auto',
                            _return_caches: bool = False):
    """Jitted sampler for the 3-level model (`sampling_hqtransformer`,
    `hqvae/utils/sampling.py:240-307` + `hqtransformer.py:409-635`).

    `n_segments` defaults to 1 here (unlike the 2-level sampler): the
    segmented scan measured SLOWER for this model on the real chip —
    6.56 ms/sample at 2 segments vs 6.04 unsegmented (bs256 flagship
    level-3, 2026-08-18) — the 3-level step is dominated by the 3 depth
    phase passes, so shrinking early-step attention compute buys less
    than the second compiled scan body costs.

    Returns fn(variables, key, labels) -> (tops [B, L], mids [B, L, 4],
    bots [B, L, 16]) with mids/bots in local raster order per top cell.
    """
    from ..models.stage2.multilevel import MultiLevelHQTransformer as ML

    hp = model.hparams
    n_heads, n_layers = hp.n_heads, hp.n_layers
    hd = hp.embed_dim // n_heads
    sos_len = hp.ctx_len_txt if model.use_txt_cond else 1

    import os as _os

    # KV-cached depth phases (exact; 21 instead of 27 depth-token passes
    # per cell — see MultiLevelHQTransformer.depth_phase_cached); the
    # recompute path stays available for A/B via HQT_ML_DEPTH_RECOMPUTE=1
    use_depth_cache = _os.environ.get('HQT_ML_DEPTH_RECOMPUTE') != '1'

    def depth_sample(variables, h, key):
        # the 3 depth-phase passes are the measured hot spot of the 3-level
        # step (ar ablation, docs/measurements/r5) — the int8_stage2_scope
        # hot path: under HQT_INT8_STAGE2=1 with calibrated scales their
        # gemms run A8W8 (mirrors the 2-level depth-second chain)
        from ..models.stage2.layers import int8_stage2_scope
        with int8_stage2_scope():
            if use_depth_cache:
                l0, kv = model.apply(variables, h, None, None, None, 0,
                                     method=ML.depth_phase_cached)
            else:
                l0 = model.apply(variables, h, None, None, 0,
                                 method=ML.depth_phase)
        key, k0 = jax.random.split(key)
        top = sample_from_logits(k0, l0, temperature=temperature[0],
                                 top_k=top_k[0], top_p=top_p[0])
        with int8_stage2_scope():
            if use_depth_cache:
                l1, kv = model.apply(variables, None, top, None, kv, 1,
                                     method=ML.depth_phase_cached)
            else:
                l1 = model.apply(variables, h, top, None, 1,
                                 method=ML.depth_phase)
        # the 4 mid / 16 bot positions are conditionally independent given
        # the parent codes (`hqtransformer.py:500-635` draws them from one
        # depth pass) — one batched draw per level instead of 4+16 serial
        key, k1 = jax.random.split(key)
        mids = sample_from_logits(k1, l1, temperature=temperature[1],
                                  top_k=top_k[1], top_p=top_p[1])
        with int8_stage2_scope():
            if use_depth_cache:
                l2, _ = model.apply(variables, None, top, mids, kv, 2,
                                    method=ML.depth_phase_cached)
            else:
                l2 = model.apply(variables, h, top, mids, 2,
                                 method=ML.depth_phase)
        key, k2 = jax.random.split(key)
        bots = sample_from_logits(k2, l2, temperature=temperature[2],
                                  top_k=top_k[2], top_p=top_p[2])
        return top, mids, bots

    # segment boundaries over spatial steps [1, max_seq_len) — same no-copy
    # scheme as the 2-level sampler: the packed path allocates the full
    # cache once and shrinks only the per-segment compute via t_compute
    bounds = []
    prev = 1
    for si in range(n_segments):
        end = max_seq_len * (si + 1) // n_segments if si < n_segments - 1 \
            else max_seq_len
        if end > prev:
            bounds.append((prev, end))
            prev = end
    if not bounds:
        bounds = [(1, max_seq_len)]

    def sample(variables, key, labels):
        import contextlib
        import os

        from ..models.stage2.layers import int8_stage2_scope

        # HQT_INT8_SPATIAL=1 extends the A8W8 gemms to the spatial steps
        # AND the cell-embedding transformer (21 tokens/cell — a real cost
        # here, unlike the 2-level 'reduce' embedding); read at trace time
        spatial_scope = (int8_stage2_scope
                         if os.environ.get('HQT_INT8_SPATIAL') == '1'
                         else contextlib.nullcontext)

        B = labels.shape[0]
        packed = _use_packed_cache(attention, hp.embed_dim, B)
        sos = model.apply(variables, B, labels,
                          method=type(model).sos_tokens)
        t_max = sos_len + max_seq_len - 1
        cdtype = cache_dtype or sos.dtype
        if cdtype == jnp.int8:
            assert packed, ("int8 KV caches need the packed cache layout; "
                            "pass attention='packed' (the 'auto' heuristic "
                            "declined it for this backend/shape)")

        def packed_t(t):
            from ..ops.pallas_attention import ROW_CHUNK
            return -(-t // ROW_CHUNK) * ROW_CHUNK

        if packed:
            kc = jnp.zeros((n_layers, packed_t(t_max), B, hp.embed_dim),
                           cdtype)
        else:
            kc = jnp.zeros(kv_cache_shape(n_layers, B, n_heads, t_max, hd),
                           cdtype)
        vc = jnp.zeros_like(kc)
        with spatial_scope():
            h_all, kc, vc = model.apply(variables, sos, kc, vc, 0,
                                        method=type(model).spatial_step)
        key, k0 = jax.random.split(key)
        top0, mid0, bot0 = depth_sample(variables, h_all[:, -1], k0)

        def make_body(t_compute):
            def body(carry, i):
                kc, vc, top, mid, bot, key = carry
                with spatial_scope():
                    x = model.apply(variables, top, mid, bot,
                                    jnp.full((B,), i - 1, jnp.int32),
                                    method=type(model).embed_cell_step)
                    h, kc, vc = model.apply(variables, x, kc, vc,
                                            sos_len + i - 1,
                                            method=type(model).spatial_step,
                                            t_compute=t_compute)
                key, ki = jax.random.split(key)
                top_i, mid_i, bot_i = depth_sample(variables, h[:, -1], ki)
                return ((kc, vc, top_i, mid_i, bot_i, key),
                        (top_i, mid_i, bot_i))
            return body

        carry = (kc, vc, top0, mid0, bot0, key)
        all_t, all_m, all_b = [], [], []
        for lo, hi in bounds:
            body = make_body(packed_t(sos_len + hi - 1) if packed else 0)
            carry, (tops, mids, bots) = jax.lax.scan(body, carry,
                                                     jnp.arange(lo, hi))
            all_t.append(tops)
            all_m.append(mids)
            all_b.append(bots)
        tops = jnp.concatenate(all_t, axis=0)
        mids = jnp.concatenate(all_m, axis=0)
        bots = jnp.concatenate(all_b, axis=0)
        tops = jnp.concatenate([top0[:, None], tops.T], axis=1)
        mids = jnp.concatenate([mid0[:, None, :], mids.transpose(1, 0, 2)],
                               axis=1)
        bots = jnp.concatenate([bot0[:, None, :], bots.transpose(1, 0, 2)],
                               axis=1)
        if _return_caches:
            # calibration hook (see make_hierarchical_sampler)
            return (tops, mids, bots), (carry[0], carry[1])
        return tops, mids, bots

    return jax.jit(sample)
