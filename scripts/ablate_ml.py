#!/usr/bin/env python
"""3-level AR delta ablations — the level-3 counterpart of ablate_ar.py:
replace ONE component of the real jitted 3-level sampling loop with a no-op
(keeping data dependencies so nothing is DCE'd) and measure the end-to-end
delta on the real chip.

AB_MODE: base (KV-cached depth phases, the serving default)
       | recompute   (HQT_ML_DEPTH_RECOMPUTE=1 prefix-recompute depth)
       | nophase1    (skip the 4-token mid pass + head)
       | nophase2    (skip the 16-token bottom pass + head)
       | nodepth     (skip all 3 depth phases)
       | noembed     (skip the 21-token cell-embedding transformer)
       | noattn      (skip spatial qkv+attention+cache)
       | nosample    (argmax instead of the fused sampler)
BENCH_BATCH sets the batch (default 256). Results: docs/measurements/r5.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import jax
import jax.numpy as jnp

import hqtransformer_tpu.models.stage2.layers as L
import hqtransformer_tpu.sampling.engine as E
from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.stage2.multilevel import MultiLevelHQTransformer as ML
from hqtransformer_tpu.models.twostage import (TwoStageModel,
                                               serving_bf16_params)

B = int(os.environ.get('BENCH_BATCH', '256'))
MODE = os.environ.get('AB_MODE', 'base')

if MODE == 'recompute':
    os.environ['HQT_ML_DEPTH_RECOMPUTE'] = '1'
elif MODE == 'nosample':
    def fake_sample(key, logits, **kw):
        return jnp.argmax(logits.astype(jnp.float32), axis=-1)
    E.sample_from_logits = fake_sample
elif MODE == 'noattn':
    def fake_step_packed(self, x, k_caches, v_caches, layer_idx, pos,
                         t_compute=0):
        return self.proj(x), k_caches, v_caches
    L.SelfAttention.step_packed = fake_step_packed
elif MODE == 'noembed':
    def fake_embed(self, top, mid, bot, position):
        D = self.hparams.embed_dim
        dep = (top[:, None, None].astype(self.dtype) * 1e-9 +
               mid[:, :1, None].astype(self.dtype) * 1e-9 +
               bot[:, :1, None].astype(self.dtype) * 1e-9)
        return dep + jnp.zeros((top.shape[0], 1, D), self.dtype)
    ML.embed_cell_step = fake_embed
elif MODE in ('nophase1', 'nophase2', 'nodepth'):
    real = ML.depth_phase_cached
    skip = {'nophase1': (1,), 'nophase2': (2,), 'nodepth': (0, 1, 2)}[MODE]

    def fake_phase(self, h, top, mid_local, depth_kv, phase):
        if phase not in skip:
            return real(self, h, top, mid_local, depth_kv, phase)
        B_ = (h if phase == 0 else top).shape[0]
        n = {0: 1, 1: 4, 2: 16}[phase]
        V = self.vocab_sizes[phase]
        Dd = self.hpd.embed_dim
        dep = (h[:, :1] if phase == 0
               else top[:, None]).astype(self.dtype) * 1e-9   # [B, 1]
        z = jnp.zeros((B_, n, V), self.dtype) + dep[:, :, None]
        z = z[:, 0] if phase == 0 else z
        # keep the cache length consistent for any later REAL phase
        rows = jnp.zeros((B_, n, Dd), self.dtype) + dep[:, :, None]
        if depth_kv is None:
            depth_kv = ([rows] * self.hpd.n_layers,
                        [rows] * self.hpd.n_layers)
        else:
            ks, vs = depth_kv
            depth_kv = ([jnp.concatenate([k, rows], 1) for k in ks],
                        [jnp.concatenate([v, rows], 1) for v in vs])
        return z, depth_kv
    ML.depth_phase_cached = fake_phase

cfg = build_twostage_config(
    'configs/imagenet/stage2/hqtransformer-l12-top8x8-level3.yaml')
model = TwoStageModel(cfg, dtype=jnp.bfloat16)
variables = model.init_variables(jax.random.PRNGKey(0))
variables = serving_bf16_params(variables)
v2 = variables['stage2']
labels = jnp.arange(B, dtype=jnp.int32) % 1000
key = jax.random.PRNGKey(1)

s = E.make_multilevel_sampler(model.stage2, 64, top_k=(2048,) * 3,
                              temperature=(0.95,) * 3,
                              cache_dtype=jnp.bfloat16, attention='packed')
c = s(v2, key, labels)
jax.block_until_ready(c)
float(jnp.sum(c[0][:1, :1].astype(jnp.float32)))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    c = s(v2, key, labels)
    jax.block_until_ready(c)
    float(jnp.sum(c[0][:1, :1].astype(jnp.float32)))
    ts.append(time.perf_counter() - t0)
print(f'L3 AR delta mode={MODE}: {min(ts) / B * 1000:.4f} ms/sample  '
      f'{min(ts) * 1000 / 63:.2f} ms/step')
