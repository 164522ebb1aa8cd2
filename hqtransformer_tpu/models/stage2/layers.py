"""Stage-2 transformer primitives: multi-head attention with explicit mask
arguments and a static-shape KV-cache decode path.

Re-design of the reference's minGPT-style blocks
(`hqvae/models/stage2/layers.py:26-431`). Differences from the reference,
deliberate and TPU-motivated:

* masks are compile-time constants passed in by the model (the reference
  rebuilds torch masks inside every forward);
* the decode path (`step`) attends against a PREALLOCATED cache
  [B, n_heads, T_max, head_dim] with a traced length — no concatenation of
  growing `past` tensors, so a 64-step `lax.scan` stays fully static;
* attention math runs in f32 on the MXU regardless of activation dtype
  (matching the fp32 softmax the reference gets from autocast).

Head splitting is channel-contiguous per head, matching the reference's
`view(T, B*nh, hs)` (`layers.py:73`), so projection weights transfer 1:1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NEG_INF = -1e10

# ---------------------------------------------------------------------------
# Opt-in A8W8 int8 gemms for the depth-second chain — the single largest AR
# phase (14.5 ms/step at the 142 TF/s bf16 gemm ceiling, scripts/ablate_ar).
# Same PTQ scheme as the stage-1 QuantizableConv (models/stage1/layers.py):
# per-tensor CALIBRATED activation scales ('act_scales' collection, via
# twostage.calibrate_stage2_int8), per-output-channel weight scales, int32
# MXU accumulation. Engages ONLY inside `int8_stage2_scope()` (the engine
# enters it around the depth-second decode) under HQT_INT8_STAGE2=1 for
# bf16 activations — training, parity paths, spatial blocks, and the
# depth-first pass never see it. No reference analogue (fp16 autocast,
# `hierarchical_ar.py:445`); quality measured by
# scripts/serving_quality_delta.py.
# ---------------------------------------------------------------------------
import contextlib
import os as _os

_INT8_STAGE2_SCOPE = [False]


@contextlib.contextmanager
def int8_stage2_scope():
    prev = _INT8_STAGE2_SCOPE[0]
    _INT8_STAGE2_SCOPE[0] = True
    try:
        yield
    finally:
        _INT8_STAGE2_SCOPE[0] = prev


def _int8_dense_active(x) -> bool:
    return (_INT8_STAGE2_SCOPE[0]
            and _os.environ.get('HQT_INT8_STAGE2') == '1'
            and x.dtype == jnp.bfloat16)


def _quant_per_tensor(x, scale):
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)


def _quant_weight_cols(w):
    """Per-output-channel symmetric int8: w [I, O] -> (wq, w_scale [O])."""
    wf = w.astype(jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0
    wq = jnp.clip(jnp.round(wf / w_scale), -127, 127).astype(jnp.int8)
    return wq, w_scale


def _int8_matmul(xq, wq, out_scale, bias, out_dtype):
    """[..., I] int8 @ [I, O] int8 -> int32 on the MXU, dequantized."""
    y = jax.lax.dot_general(xq.reshape(-1, xq.shape[-1]), wq,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * out_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.reshape(*xq.shape[:-1], wq.shape[-1]).astype(out_dtype)


class QuantizableDense(nn.Dense):
    """nn.Dense with the scoped A8W8 path (identical params/checkpoints).

    The activation scale is STATIC (calibrated): dynamic per-call max
    reductions are what limited the dynamic int8 conv decode to 1.07x e2e.
    Calibration sows input absmax into 'int8_calib' (reduce=max across
    calls), converted by `int8_scales_from_calib` into 'act_scales'."""

    @nn.compact
    def __call__(self, x):
        from ..stage1.layers import _INT8_CALIB_SCOPE
        if _INT8_CALIB_SCOPE[0]:
            self.sow('int8_calib', 'absmax',
                     jnp.max(jnp.abs(x.astype(jnp.float32))),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.zeros((), jnp.float32))
        if not _int8_dense_active(x):
            return super().__call__(x)
        if not self.has_variable('act_scales', 'scale'):
            raise ValueError(
                'HQT_INT8_STAGE2=1 inside int8_stage2_scope needs calibrated '
                'activation scales: run twostage.calibrate_stage2_int8() and '
                'pass its variables')
        # materialize the standard nn.Dense params (identical names/shapes)
        _ = super().__call__(x[..., :1, :])
        kernel = self.variables['params']['kernel']
        bias = self.variables['params'].get('bias')
        x_scale = self.get_variable('act_scales',
                                    'scale').astype(jnp.float32)
        wq, w_scale = _quant_weight_cols(kernel)   # hoisted out of the scan
        xq = _quant_per_tensor(x, x_scale)
        return _int8_matmul(xq, wq, x_scale * w_scale, bias, x.dtype)


def gelu(x: jax.Array, use_approx: bool = False) -> jax.Array:
    """GELU; approx variant is x*sigmoid(1.702x) (`layers.py:14-23`).

    For bf16 activations the exact-erf path uses the tanh-form instead:
    measured over [-8, 8], its bf16 output differs from bf16-rounded exact
    GELU by AT MOST 1 ulp — i.e. within bf16 arithmetic's own rounding
    noise — while XLA's erf costs 1.87 ms/step of the bf16 decode loop
    (measured, ~15%). f32 runs (training, parity tests) keep exact erf.
    """
    if use_approx:
        return x * jax.nn.sigmoid(1.702 * x)
    if x.dtype == jnp.bfloat16:
        # x * Phi(x), Phi ~ sigmoid(1.5957691x + 0.0713548x^3)
        x32 = x.astype(jnp.float32)
        z = 1.595769122 * x32 + 0.071354816 * (x32 * x32 * x32)
        return (x32 * jax.nn.sigmoid(z)).astype(jnp.bfloat16)
    return jax.nn.gelu(x, approximate=False)


def _split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    """[B, T, C] -> [B, nh, T, hd]."""
    B, T, C = x.shape
    return x.reshape(B, T, n_heads, C // n_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    """[B, nh, T, hd] -> [B, T, C]."""
    B, nh, T, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, nh * hd)


def masked_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     mask: Optional[jax.Array],
                     valid_len: Optional[jax.Array] = None) -> jax.Array:
    """Scaled dot-product attention over [B, nh, T, hd] tensors.

    `mask`: bool [Tq, Tk] or None (no masking). `valid_len`: optional traced
    scalar — keys at positions >= valid_len are masked out (KV-cache decode).
    Scores/softmax in f32.
    """
    hd = q.shape[-1]
    att = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                     preferred_element_type=jnp.float32)
    att = att * (1.0 / np.sqrt(hd))
    if mask is not None:
        att = jnp.where(mask[None, None], att, NEG_INF)
    if valid_len is not None:
        pos = jnp.arange(k.shape[2])
        att = jnp.where((pos < valid_len)[None, None, None, :], att, NEG_INF)
    att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum('bhqk,bhkd->bhqd', att.astype(v.dtype), v)


class SelfAttention(nn.Module):
    """Multi-head self-attention (`layers.py:26-195`) with full-sequence and
    cached-decode entry points sharing the same parameters."""
    embed_dim: int
    n_heads: int
    attn_bias: bool = True
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = dict(use_bias=self.attn_bias, dtype=self.dtype)
        self.query = QuantizableDense(self.embed_dim, name='query', **d)
        self.key = QuantizableDense(self.embed_dim, name='key', **d)
        self.value = QuantizableDense(self.embed_dim, name='value', **d)
        self.proj = QuantizableDense(self.embed_dim, name='proj', **d)
        self.resid_drop = nn.Dropout(self.resid_pdrop)

    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 contexts: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        """Full-sequence attention. With `contexts`, keys/values cover
        [contexts; x] (text-prefix training path, `layers.py:75-82`)."""
        q = _split_heads(self.query(x), self.n_heads)
        kv_in = x if contexts is None else jnp.concatenate([contexts, x], 1)
        k = _split_heads(self.key(kv_in), self.n_heads)
        v = _split_heads(self.value(kv_in), self.n_heads)
        y = _merge_heads(masked_attention(q, k, v, mask))
        y = self.proj(y)
        if self.resid_pdrop > 0.0:
            y = self.resid_drop(y, deterministic=deterministic)
        return y

    def step(self, x: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
             cache_len, self_mask: Optional[jax.Array] = None
             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Cached decode: x [B, T_new, C]; k/v_cache [B, nh, T_max, hd].

        Writes the new keys/values at [cache_len, cache_len+T_new), attends
        over the first cache_len + T_new positions (the reference's
        past-concat branch, `layers.py:93-99,119-123`), with `self_mask`
        [T_new, T_new] restricting attention among the new tokens (tril by
        default; full for the parallel depth decode, `layers.py:147-152`).
        Returns (y, k_cache', v_cache').
        """
        B, T_new, C = x.shape
        # fused qkv: one [C, 3C] gemm instead of three [C, C] gemms — the
        # weight concat is loop-invariant and hoisted out of the decode scan
        w_qkv = jnp.concatenate([self.query.variables['params']['kernel'],
                                 self.key.variables['params']['kernel'],
                                 self.value.variables['params']['kernel']],
                                axis=1)
        qkv = jnp.dot(x, w_qkv.astype(x.dtype))
        if self.attn_bias:
            b_qkv = jnp.concatenate(
                [self.query.variables['params']['bias'],
                 self.key.variables['params']['bias'],
                 self.value.variables['params']['bias']])
            qkv = qkv + b_qkv.astype(x.dtype)
        q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, self.n_heads)
        k_new = _split_heads(k_new, self.n_heads)
        v_new = _split_heads(v_new, self.n_heads)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_new.astype(k_cache.dtype), (0, 0, cache_len, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_new.astype(v_cache.dtype), (0, 0, cache_len, 0))

        T_max = k_cache.shape[2]
        pos = jnp.arange(T_max)
        # past positions all visible; new positions per self_mask
        if self_mask is None:
            self_mask = jnp.tril(jnp.ones((T_new, T_new), bool))
        new_idx = pos - cache_len  # index of key among new tokens (>=0)
        is_past = pos < cache_len
        in_new = (new_idx >= 0) & (new_idx < T_new)
        sm = jnp.take_along_axis(
            jnp.pad(self_mask, ((0, 0), (0, 1))),
            jnp.clip(new_idx, 0, T_new)[None, :].repeat(T_new, 0), axis=1)
        mask = is_past[None, :] | (in_new[None, :] & sm)  # [T_new, T_max]

        hd = q.shape[-1]
        att = jnp.einsum('bhqd,bhkd->bhqk', q,
                         k_cache.astype(q.dtype),
                         preferred_element_type=jnp.float32)
        att = att * (1.0 / np.sqrt(hd))
        att = jnp.where(mask[None, None], att, NEG_INF)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum('bhqk,bhkd->bhqd', att.astype(x.dtype),
                       v_cache.astype(x.dtype))
        return self.proj(_merge_heads(y)), k_cache, v_cache

    def _fused_qkv_flat(self, x):
        """One [C, 3C] gemm (loop-invariant weight concat, hoisted out of
        the decode scan) -> [B, T, 3C]. Inside `int8_stage2_scope` (with
        HQT_INT8_STAGE2=1 and calibrated scales) the gemm runs A8W8: the
        activation is the same ln1 output the `query` Dense sees in the
        full-sequence path, so its calibrated scale applies."""
        w_qkv = jnp.concatenate([self.query.variables['params']['kernel'],
                                 self.key.variables['params']['kernel'],
                                 self.value.variables['params']['kernel']],
                                axis=1)
        b_qkv = None
        if self.attn_bias:
            b_qkv = jnp.concatenate(
                [self.query.variables['params']['bias'],
                 self.key.variables['params']['bias'],
                 self.value.variables['params']['bias']])
        if (_int8_dense_active(x)
                and self.query.has_variable('act_scales', 'scale')):
            x_scale = self.query.get_variable(
                'act_scales', 'scale').astype(jnp.float32)
            wq, w_scale = _quant_weight_cols(w_qkv)  # hoisted out of scan
            return _int8_matmul(_quant_per_tensor(x, x_scale), wq,
                                x_scale * w_scale, b_qkv, x.dtype)
        qkv = jnp.dot(x, w_qkv.astype(x.dtype))
        if b_qkv is not None:
            qkv = qkv + b_qkv.astype(x.dtype)
        return qkv

    def _fused_qkv(self, x):
        """Fused qkv gemm -> per-head q, k, v."""
        q, k_new, v_new = jnp.split(self._fused_qkv_flat(x), 3, axis=-1)
        return (_split_heads(q, self.n_heads),
                _split_heads(k_new, self.n_heads),
                _split_heads(v_new, self.n_heads))

    def step_stacked(self, x: jax.Array, k_caches: jax.Array,
                     v_caches: jax.Array, layer_idx: int, cache_len,
                     self_mask: Optional[jax.Array] = None
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Like `step`, but against STACKED caches: writes only this layer's
        [B, ·, T_new, ·] slice in place (XLA aliases the scan-carry buffer)
        instead of the gather-modify-restack pattern that copies the whole
        cache every layer of every step.

        The cache layout is [L, B, nh/g, T_max, g*hd] with g =
        `cache_group(nh, hd)` heads PACKED per row so the minor dim is a
        whole number of 128-lane tiles: bf16 pads the minor dimension to
        128, so the reference dims (hd=64) in the naive [.., T, hd] layout
        would stream 2x the cache bytes from HBM on every decode step. The
        per-head attention math is recovered with parity-masked queries
        (g x the attention FLOPs — noise next to the bandwidth saved).
        g == 1 falls back to the plain per-head layout."""
        B, T_new, C = x.shape
        g = self.n_heads // k_caches.shape[2]
        if g > 1:
            q, k_new, v_new = jnp.split(self._fused_qkv_flat(x), 3, axis=-1)
            G, gh = k_caches.shape[2], k_caches.shape[4]
            k_new = k_new.reshape(B, T_new, G, gh).transpose(0, 2, 1, 3)
            v_new = v_new.reshape(B, T_new, G, gh).transpose(0, 2, 1, 3)
        else:
            q, k_new, v_new = self._fused_qkv(x)
        k_caches = jax.lax.dynamic_update_slice(
            k_caches, k_new[None].astype(k_caches.dtype),
            (layer_idx, 0, 0, cache_len, 0))
        v_caches = jax.lax.dynamic_update_slice(
            v_caches, v_new[None].astype(v_caches.dtype),
            (layer_idx, 0, 0, cache_len, 0))

        T_max = k_caches.shape[3]
        pos = jnp.arange(T_max)
        if self_mask is None:
            self_mask = jnp.tril(jnp.ones((T_new, T_new), bool))
        new_idx = pos - cache_len
        is_past = pos < cache_len
        in_new = (new_idx >= 0) & (new_idx < T_new)
        sm = jnp.take_along_axis(
            jnp.pad(self_mask, ((0, 0), (0, 1))),
            jnp.clip(new_idx, 0, T_new)[None, :].repeat(T_new, 0), axis=1)
        mask = is_past[None, :] | (in_new[None, :] & sm)  # [T_new, T_max]

        hd = C // self.n_heads
        scale = 1.0 / np.sqrt(hd)
        if g > 1:
            G, gh = k_caches.shape[2], k_caches.shape[4]
            # parity masks select each packed head's hd-slice of the row
            par = (jnp.arange(gh) // hd)[None, :] == jnp.arange(g)[:, None]
            par = par.astype(x.dtype)                       # [g, gh]
            q2 = q.reshape(B, T_new, G, gh)
            qm = jnp.einsum('bqgk,pk->bgpqk', q2, par)
            att = jnp.einsum('bgtk,bgpqk->bgpqt',
                             k_caches[layer_idx].astype(x.dtype), qm,
                             preferred_element_type=jnp.float32) * scale
            att = jnp.where(mask[None, None, None], att, NEG_INF)
            att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
            y2 = jnp.einsum('bgpqt,bgtk->bgpqk', att,
                            v_caches[layer_idx].astype(x.dtype))
            y = jnp.einsum('bgpqk,pk->bqgk', y2, par)       # select parity
            y = y.reshape(B, T_new, C)
            return self.proj(y), k_caches, v_caches

        att = jnp.einsum('bhqd,bhkd->bhqk', q,
                         k_caches[layer_idx].astype(q.dtype),
                         preferred_element_type=jnp.float32)
        att = att * scale
        att = jnp.where(mask[None, None], att, NEG_INF)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum('bhqk,bhkd->bhqd', att.astype(x.dtype),
                       v_caches[layer_idx].astype(x.dtype))
        return self.proj(_merge_heads(y)), k_caches, v_caches


def tiny_attention(q: jax.Array, k: jax.Array, v: jax.Array, n_heads: int,
                   mask: Optional[jax.Array] = None) -> jax.Array:
    """Multi-head attention for TINY sequences (depth chains: Tq, Tk <= 21)
    in flat [B, T, D] layout. Per-head einsums at these shapes lower to
    thousands of tile-padded micro-matmuls on the MXU; instead compute the
    per-head scores via one elementwise product + a head-parity matmul
    (exact same math — see ops/pallas_attention.py):
        s[b,q,t,h] = sum_d (q[b,q,:] * k[b,t,:])[d] . par[d,h]
    `mask`: bool [Tq, Tk] or None (full attention). Softmax in f32."""
    D = q.shape[-1]
    hd = D // n_heads
    par = ((jnp.arange(D) // hd)[:, None] == jnp.arange(n_heads)[None, :])
    scale = 1.0 / np.sqrt(hd)
    P = q[:, :, None, :] * k[:, None, :, :]            # [B, Tq, Tk, D]
    s = jnp.einsum('bqtd,dh->bqth', P, par.astype(P.dtype),
                   preferred_element_type=jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask[None, :, :, None], s, NEG_INF)
    att = jax.nn.softmax(s, axis=2)                    # [B, Tq, Tk, nh]
    A = jnp.einsum('bqth,dh->bqtd', att.astype(q.dtype),
                   par.astype(q.dtype))
    return jnp.sum(A * v[:, None, :, :], axis=2)       # [B, Tq, D]


def _quantize_rows(x: jax.Array, inv_scale: jax.Array) -> jax.Array:
    """Per-channel symmetric int8 quantization: x [..., D], inv_scale [D]."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv_scale),
                    -127, 127).astype(jnp.int8)


class _PackedStepMixin:
    """Single-token decode against packed [L, T, B, D] caches via the fused
    Pallas attention kernel (TPU) or its XLA oracle (other backends).

    int8 KV cache mode (cache dtype int8): K/V rows are per-channel
    symmetric-quantized at write time with calibrated scales from the
    'kv_scales' collection (see twostage.calibrate_kv_scales). Dequant is
    folded entirely outside the attention math — K's scales into q (scores
    are a q·K channel sum) and V's into the attention output (a weighted sum
    of V rows) — so the kernel stays scale-free and the cache HBM traffic is
    exactly half the bf16 bytes."""

    def _kv_scales(self, C: int):
        """Calibrated per-channel scales ([C] each) for the int8 KV cache;
        requires calibration (there is no safe default for abs-max scales)."""
        if not self.has_variable('kv_scales', 'k'):
            raise ValueError(
                'int8 KV cache needs calibrated scales: run '
                'calibrate_kv_scales() and pass its \'kv_scales\' '
                'collection in variables')
        return (self.get_variable('kv_scales', 'k'),
                self.get_variable('kv_scales', 'v'))

    def step_packed(self, x: jax.Array, k_caches: jax.Array,
                    v_caches: jax.Array, layer_idx: int, pos,
                    t_compute: int = 0
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        import os
        from ...ops.pallas_attention import (decode_attention_step,
                                             decode_attention_step_xla)
        B, T_new, C = x.shape
        assert T_new == 1, 'packed path is single-token decode only'
        q, k_new, v_new = jnp.split(self._fused_qkv_flat(x)[:, 0, :], 3,
                                    axis=-1)
        v_scale = None
        if k_caches.dtype == jnp.int8:
            k_scale, v_scale = self._kv_scales(C)
            q = q * k_scale.astype(q.dtype)
            k_new = _quantize_rows(k_new, 1.0 / k_scale)
            v_new = _quantize_rows(v_new, 1.0 / v_scale)
        if jax.default_backend() == 'tpu':
            y, k_caches, v_caches = decode_attention_step(
                q, k_new, v_new, k_caches, v_caches, layer_idx, pos,
                self.n_heads, t_compute=t_compute)
        elif os.environ.get('HQT_PACKED_INTERPRET') == '1':
            # interpret-mode kernel on CPU: reproduces the kernel's exact
            # dtype-rounding semantics (bf16 q*k products) for the
            # divergence-measurement tests
            y, k_caches, v_caches = decode_attention_step(
                q, k_new, v_new, k_caches, v_caches, layer_idx, pos,
                self.n_heads, interpret=True, t_compute=t_compute)
        else:
            # XLA oracle: t_compute is a pure compute bound — rows beyond
            # pos already get exactly-zero weight, so results are identical
            y, k_caches, v_caches = decode_attention_step_xla(
                q, k_new, v_new, k_caches, v_caches, layer_idx, pos,
                self.n_heads)
        if v_scale is not None:
            y = y * v_scale.astype(y.dtype)
        return self.proj(y[:, None, :]), k_caches, v_caches

    def prefill_packed(self, x: jax.Array, k_caches: jax.Array,
                       v_caches: jax.Array, layer_idx: int,
                       self_mask: Optional[jax.Array] = None
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Write the first T_new rows and attend among them (cache starts
        empty — the conditioning-prefix prefill)."""
        B, T_new, C = x.shape
        q, k_new, v_new = jnp.split(self._fused_qkv_flat(x), 3, axis=-1)
        if k_caches.dtype == jnp.int8:
            k_scale, v_scale = self._kv_scales(C)
            k_rows = _quantize_rows(k_new, 1.0 / k_scale)
            v_rows = _quantize_rows(v_new, 1.0 / v_scale)
        else:
            k_rows = k_new.astype(k_caches.dtype)
            v_rows = v_new.astype(v_caches.dtype)
        k_caches = jax.lax.dynamic_update_slice(
            k_caches, k_rows.transpose(1, 0, 2)[None], (layer_idx, 0, 0, 0))
        v_caches = jax.lax.dynamic_update_slice(
            v_caches, v_rows.transpose(1, 0, 2)[None], (layer_idx, 0, 0, 0))
        if self_mask is None:
            self_mask = jnp.tril(jnp.ones((T_new, T_new), bool))
        y = masked_attention(_split_heads(q, self.n_heads),
                             _split_heads(k_new, self.n_heads),
                             _split_heads(v_new, self.n_heads), self_mask)
        return self.proj(_merge_heads(y)), k_caches, v_caches


# mix the packed decode into SelfAttention (kept separate for readability)
SelfAttention.step_packed = _PackedStepMixin.step_packed
SelfAttention.prefill_packed = _PackedStepMixin.prefill_packed
SelfAttention._kv_scales = _PackedStepMixin._kv_scales


class CrossAttention(nn.Module):
    """Multi-head cross-attention (`layers.py:198-286`)."""
    embed_dim: int
    n_heads: int
    attn_bias: bool = True
    resid_pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = dict(use_bias=self.attn_bias, dtype=self.dtype)
        self.query = nn.Dense(self.embed_dim, name='query', **d)
        self.key = nn.Dense(self.embed_dim, name='key', **d)
        self.value = nn.Dense(self.embed_dim, name='value', **d)
        self.proj = nn.Dense(self.embed_dim, name='proj', **d)

    def __call__(self, x: jax.Array, x_query: jax.Array,
                 mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        q = _split_heads(self.query(x_query), self.n_heads)
        k = _split_heads(self.key(x), self.n_heads)
        v = _split_heads(self.value(x), self.n_heads)
        return self.proj(_merge_heads(masked_attention(q, k, v, mask)))


class Block(nn.Module):
    """Pre-LN transformer block: x + attn(ln1 x); x + mlp(ln2 x)
    (`layers.py:290-328`). The mask argument selects the regime; ParallelBlock
    (`layers.py:332-375`) is this block with a parallel mask."""
    embed_dim: int
    n_heads: int
    mlp_bias: bool = True
    attn_bias: bool = True
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    gelu_use_approx: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.ln1 = nn.LayerNorm(epsilon=1e-5, name='ln1', dtype=self.dtype)
        self.ln2 = nn.LayerNorm(epsilon=1e-5, name='ln2', dtype=self.dtype)
        self.attn = SelfAttention(embed_dim=self.embed_dim,
                                  n_heads=self.n_heads,
                                  attn_bias=self.attn_bias,
                                  attn_pdrop=self.attn_pdrop,
                                  resid_pdrop=self.resid_pdrop,
                                  dtype=self.dtype, name='attn')
        self.mlp_0 = QuantizableDense(4 * self.embed_dim,
                                      use_bias=self.mlp_bias,
                                      name='mlp_0', dtype=self.dtype)
        self.mlp_2 = QuantizableDense(self.embed_dim,
                                      use_bias=self.mlp_bias,
                                      name='mlp_2', dtype=self.dtype)
        self.mlp_drop = nn.Dropout(self.resid_pdrop)

    def _mlp(self, x, deterministic):
        h = self.mlp_2(gelu(self.mlp_0(x), self.gelu_use_approx))
        if self.resid_pdrop > 0.0:
            h = self.mlp_drop(h, deterministic=deterministic)
        return h

    def __call__(self, x, mask=None, contexts=None, deterministic=True):
        x = x + self.attn(self.ln1(x), mask=mask, contexts=contexts,
                          deterministic=deterministic)
        x = x + self._mlp(self.ln2(x), deterministic)
        return x

    def step(self, x, k_cache, v_cache, cache_len, self_mask=None):
        a, k_cache, v_cache = self.attn.step(self.ln1(x), k_cache, v_cache,
                                             cache_len, self_mask)
        x = x + a
        x = x + self._mlp(self.ln2(x), True)
        return x, k_cache, v_cache

    def step_stacked(self, x, k_caches, v_caches, layer_idx, cache_len,
                     self_mask=None, t_compute: int = 0):
        """Decode step dispatching on cache layout: 5-D [L, B, nh, T, hd]
        per-head caches -> einsum path; 4-D [L, T, B, D] packed caches ->
        fused Pallas kernel (single token) or packed prefill."""
        if k_caches.ndim == 4:
            if x.shape[1] == 1 and not isinstance(cache_len, int):
                a, k_caches, v_caches = self.attn.step_packed(
                    self.ln1(x), k_caches, v_caches, layer_idx, cache_len,
                    t_compute=t_compute)
            else:
                # static cache_len == 0: conditioning-prefix prefill
                assert isinstance(cache_len, int) and cache_len == 0, (
                    'packed caches support single-token decode and '
                    'prefill-at-0 only')
                a, k_caches, v_caches = self.attn.prefill_packed(
                    self.ln1(x), k_caches, v_caches, layer_idx, self_mask)
        else:
            a, k_caches, v_caches = self.attn.step_stacked(
                self.ln1(x), k_caches, v_caches, layer_idx, cache_len,
                self_mask)
        x = x + a
        x = x + self._mlp(self.ln2(x), True)
        return x, k_caches, v_caches


class DecoderBlock(nn.Module):
    """Self-attention + cross-attention block (`layers.py:379-431`; defined
    by the reference but never instantiated — provided for API parity)."""
    embed_dim: int
    n_heads: int
    mlp_bias: bool = True
    attn_bias: bool = True
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    gelu_use_approx: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.ln1 = nn.LayerNorm(epsilon=1e-5, name='ln1', dtype=self.dtype)
        self.ln2 = nn.LayerNorm(epsilon=1e-5, name='ln2', dtype=self.dtype)
        self.ln3 = nn.LayerNorm(epsilon=1e-5, name='ln3', dtype=self.dtype)
        self.attn1 = SelfAttention(embed_dim=self.embed_dim,
                                   n_heads=self.n_heads,
                                   attn_bias=self.attn_bias,
                                   dtype=self.dtype, name='attn1')
        self.attn2 = CrossAttention(embed_dim=self.embed_dim,
                                    n_heads=self.n_heads,
                                    attn_bias=self.attn_bias,
                                    dtype=self.dtype, name='attn2')
        self.mlp_0 = nn.Dense(4 * self.embed_dim, use_bias=self.mlp_bias,
                              name='mlp_0', dtype=self.dtype)
        self.mlp_2 = nn.Dense(self.embed_dim, use_bias=self.mlp_bias,
                              name='mlp_2', dtype=self.dtype)

    def __call__(self, x, contexts, mask=None, deterministic=True):
        x = x + self.attn1(self.ln1(x), mask=mask,
                           deterministic=deterministic)
        x = x + self.attn2(contexts, self.ln2(x))
        x = x + self.mlp_2(gelu(self.mlp_0(self.ln3(x)),
                                self.gelu_use_approx))
        return x


def cache_group(n_heads: int, head_dim: int, packed: bool = False) -> int:
    """Heads packed per KV-cache row (g = 128/hd when hd < 128 divides
    128). Measured on v5e: XLA lays out the per-head [.., T, hd=64] cache
    WITHOUT minor-dim padding waste, and the parity-masked packed einsum
    formulations compile to slower programs than the naive per-head batched
    matmuls (4.30 vs 7.83 ms/step at flagship shapes) — so packing is OFF by
    default and exists for Pallas kernels that want [.., T, g*hd] rows."""
    if packed and head_dim < 128 and 128 % head_dim == 0 and \
            n_heads % (128 // head_dim) == 0:
        return 128 // head_dim
    return 1


def kv_cache_shape(n_layers: int, batch: int, n_heads: int, t_max: int,
                   head_dim: int, packed: bool = False) -> Tuple[int, ...]:
    """Stacked packed cache shape [L, B, nh/g, T_max, g*hd] (see
    `cache_group`; g == 1 degenerates to the per-head layout)."""
    g = cache_group(n_heads, head_dim, packed)
    return (n_layers, batch, n_heads // g, t_max, g * head_dim)


def init_kv_cache(n_layers: int, batch: int, n_heads: int, t_max: int,
                  head_dim: int, dtype=jnp.float32
                  ) -> Tuple[jax.Array, jax.Array]:
    """Stacked per-layer caches in the packed layout."""
    shape = kv_cache_shape(n_layers, batch, n_heads, t_max, head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
