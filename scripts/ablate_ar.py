#!/usr/bin/env python
"""In-context AR delta ablations: replace ONE component of the real jitted
sampling loop with a no-op (keeping data dependencies so nothing else is
DCE'd) and measure the end-to-end delta — the component costs that
microbenchmarks of the pieces in isolation do NOT reproduce (measured:
standalone probes disagree with in-context deltas by up to 2x).

AB_MODE: base | noattn (skip qkv+attention+cache) | attnwrite (keep
qkv+cache writes, skip attention math) | nodepth2 (skip the depth-second
chain + head_bot) | nosample (argmax instead of the fused sampler) |
noembed | nodfirst.  BENCH_BATCH sets the batch (default 2048).

Measured deltas at B=2048 vs base 39.21 ms/step (re-derived 2026-08-18,
v5e): attention total 9.79 (8.09 of score/AV math + cache DMA reads,
1.70 of qkv + cache writes), depth-second chain 14.64 (= its 2.06
TFLOP/step at the 142 TF/s ceiling), sampling 3.53, embed ~0.7 and
depth-first+head_top ~2.9 (earlier probes). AB_KV=int8 (calibrated int8
KV cache) cuts the base step to 36.60 ms (-2.61 ms/step, AR 1.206 ->
1.126 ms/sample); HQT_ATTN_ROW_CHUNK sweep under int8 KV: 16 ties the
default 8 (1.123 vs 1.126), 32 is worse (1.148).
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import jax, jax.numpy as jnp
from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.twostage import (TwoStageModel,
                                               serving_bf16_params)
import hqtransformer_tpu.sampling.engine as E
import hqtransformer_tpu.models.stage2.layers as L
from hqtransformer_tpu.models.stage2.hierarchical import HierarchicalGPT
from hqtransformer_tpu.sampling.engine import SamplingParams, make_hierarchical_sampler

B = int(os.environ.get('BENCH_BATCH', '2048'))
MODE = os.environ.get('AB_MODE', 'base')

if MODE == 'nosample':
    real = E.sample_from_logits
    def fake_sample(key, logits, **kw):
        return jnp.argmax(logits.astype(jnp.float32), axis=-1)
    E.sample_from_logits = fake_sample
elif MODE == 'noattn':
    def fake_step_packed(self, x, k_caches, v_caches, layer_idx, pos,
                         t_compute=0):
        return self.proj(self.ln1_dummy(x) if False else x), k_caches, v_caches
    L.SelfAttention.step_packed = fake_step_packed
elif MODE == 'attnwrite':
    # keep the cache-row writes (and thus the scan-carry behavior), skip
    # the attention math: isolates carry/update cost from compute/DMA
    def fake_step_packed(self, x, k_caches, v_caches, layer_idx, pos,
                         t_compute=0):
        q, k_new, v_new = jnp.split(self._fused_qkv_flat(x)[:, 0, :], 3, axis=-1)
        k_caches = jax.lax.dynamic_update_slice(
            k_caches, k_new[None, None].astype(k_caches.dtype), (layer_idx, pos, 0, 0))
        v_caches = jax.lax.dynamic_update_slice(
            v_caches, v_new[None, None].astype(v_caches.dtype), (layer_idx, pos, 0, 0))
        return self.proj(q[:, None, :]), k_caches, v_caches
    L.SelfAttention.step_packed = fake_step_packed
elif MODE == 'nodepth2':
    real_ds = HierarchicalGPT.depth_second_logits
    def fake_ds(self, codes, depth_kv, group=1):
        B_ = codes.shape[0]
        z = jnp.zeros((B_, self.num_bottom_pred, self.vocab_size_bot), self.dtype)
        # keep a data dependency on codes so nothing else gets DCE'd
        z = z + codes[:, :1, None].astype(self.dtype) * 1e-9
        return z, depth_kv
    HierarchicalGPT.depth_second_logits = fake_ds
elif MODE == 'noembed':
    def fake_embed(self, code_t, bot_cell, position):
        D = self.hparams.embed_dim
        return (code_t[:, None, None].astype(self.dtype) * 1e-9 +
                jnp.zeros((code_t.shape[0], 1, D), self.dtype))
    HierarchicalGPT.embed_cell_step = fake_embed
elif MODE == 'nodfirst':
    def fake_df(self, h):
        B_ = h.shape[0]
        lt = jnp.zeros((B_, self.vocab_size_top), self.dtype) + h[:, :1] * 1e-9
        nh = self.hpd.n_heads
        hd = self.hpd.embed_dim // nh
        k = jnp.zeros((B_, nh, 1, hd), h.dtype) + h[:, 0, None, None, None] * 1e-9
        ks = [k for _ in range(self.hpd.n_layers)]
        return lt, (ks, [k for _ in range(self.hpd.n_layers)])
    HierarchicalGPT.depth_first_logits = fake_df

cfg = build_twostage_config('configs/imagenet/stage2/hqtransformer-l12-top8x8.yaml')
model = TwoStageModel(cfg, dtype=jnp.bfloat16)
variables = model.init_variables(jax.random.PRNGKey(0))
variables = serving_bf16_params(variables)
sp = SamplingParams(top_k_top=2048, top_k_bot=2048, temperature_top=0.95, temperature_bot=0.95)
labels = jnp.arange(B, dtype=jnp.int32) % 1000
key = jax.random.PRNGKey(1)
# AB_KV=int8 stores the spatial KV cache int8 (calibrated per-channel
# scales; see twostage.calibrate_kv_scales) — ablate the DMA-floor lever
KV = os.environ.get('AB_KV', 'bf16')
cache_dtype = jnp.bfloat16
if KV == 'int8':
    variables = model.calibrate_kv_scales(
        variables, jax.random.PRNGKey(5), labels[:256], params=sp)
    cache_dtype = jnp.int8
v2 = variables['stage2']
s = make_hierarchical_sampler(model.stage2, 64, sp, cache_dtype=cache_dtype,
                              n_segments=4, attention='packed')
c = s(v2, key, labels); jax.block_until_ready(c); float(jnp.sum(c[0][:1,:1].astype(jnp.float32)))
ts = []
for _ in range(3):
    t0 = time.perf_counter(); c = s(v2, key, labels); jax.block_until_ready(c)
    float(jnp.sum(c[0][:1,:1].astype(jnp.float32))); ts.append(time.perf_counter() - t0)
print(f'AR delta mode={MODE} kv={KV}: {min(ts)/B*1000:.4f} ms/sample  {min(ts)*1000/63:.2f} ms/step')
