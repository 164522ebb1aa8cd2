"""int8 serving for the 3-level model: calibrated int8 KV cache + A8W8
depth-phase gemms (HQT_INT8_STAGE2=1) extend to MultiLevelHQTransformer
the same way they cover the 2-level HierarchicalGPT (test_int8_kv.py).
Also exercises the TwoStageModel calibration surface measure_throughput.py
uses for `serving=int8max code_levels=3` so the TPU family row can't hit a
path never traced before.

No reference analogue (its sampling runs fp16 autocast,
`hqvae/models/stage2/hierarchical_ar.py:445`); float stays the default.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import Stage2Hparams
from hqtransformer_tpu.models.stage2.multilevel import (
    MultiLevelHQTransformer, cells_to_level)
from hqtransformer_tpu.sampling.engine import make_multilevel_sampler

VOCABS = (32, 48, 64)


def _tiny_model(dtype=jnp.float32):
    hp = Stage2Hparams(
        embed_dim=64, n_layers=2, n_heads=4, n_dense_layers=2,
        ctx_len=None, ctx_len_img=16, ctx_len_txt=8, embd_pdrop=0.0,
        resid_pdrop=0.0, attn_pdrop=0.0, mlp_bias=True, attn_bias=True,
        gelu_use_approx=False, use_head_txt=True, n_classes=10,
        causal_attn=None, embedding_type='transformer1',
        position_embedding='1d', bottom_head_type='linear',
        use_random_order=False, rate_random_order=1.0)
    model = MultiLevelHQTransformer(
        vocab_sizes=VOCABS, vocab_size_txt=16, decoding_type='parallel-add',
        use_cls_cond=True, use_txt_cond=False, hparams=hp, dtype=dtype)
    B, Ttop = 8, 16
    labels = jnp.arange(1, B + 1, dtype=jnp.int32) % 10
    codes = [jnp.zeros((B, Ttop), jnp.int32),
             jnp.zeros((B, Ttop * 4), jnp.int32),
             jnp.zeros((B, Ttop * 16), jnp.int32)]
    variables = model.init(jax.random.PRNGKey(0), codes, labels)
    return model, variables, labels, Ttop


def _kv_scales_from_run(model, variables, labels, Ttop):
    sampler = make_multilevel_sampler(model, Ttop, _return_caches=True)
    _, (kc, vc) = sampler(variables, jax.random.PRNGKey(3), labels)

    def channel_absmax(c):
        if c.ndim == 4:
            m = jnp.max(jnp.abs(c.astype(jnp.float32)), axis=(1, 2))
        else:
            L, B, nh, T, hd = c.shape
            m = jnp.max(jnp.abs(c.astype(jnp.float32)),
                        axis=(1, 3)).reshape(L, nh * hd)
        return jnp.maximum(m, 1e-6) / 127.0

    ks, vs = channel_absmax(kc), channel_absmax(vc)
    return {f'blocks_{i}': {'attn': {'k': ks[i], 'v': vs[i]}}
            for i in range(model.hparams.n_layers)}


def _agreement(a, b):
    return float(np.mean(np.asarray(a) == np.asarray(b)))


def test_int8_kv_multilevel_sampler_tracks_float_path():
    model, variables, labels, Ttop = _tiny_model()
    tk, temp = (16, 16, 16), (0.9, 0.9, 0.9)
    key = jax.random.PRNGKey(7)

    ref = make_multilevel_sampler(model, Ttop, top_k=tk, temperature=temp,
                                  attention='packed')
    t_f, m_f, b_f = ref(variables, key, labels)

    vars_q = {**variables,
              'kv_scales': _kv_scales_from_run(model, variables, labels,
                                               Ttop)}
    q8 = make_multilevel_sampler(model, Ttop, top_k=tk, temperature=temp,
                                 attention='packed', cache_dtype=jnp.int8)
    t_q, m_q, b_q = q8(vars_q, key, labels)

    assert t_q.shape == t_f.shape and b_q.shape == b_f.shape
    assert _agreement(t_q, t_f) > 0.85, _agreement(t_q, t_f)
    assert _agreement(m_q, m_f) > 0.85, _agreement(m_q, m_f)
    assert _agreement(b_q, b_f) > 0.85, _agreement(b_q, b_f)


def test_int8_depth_phase_gemms_track_float_path():
    """A8W8 depth-phase + spatial gemms (the serving=int8max scope set) on
    the 3-level sampler keep tracking the bf16 token stream. Divergence
    cascades autoregressively through 21 child codes per cell, so the bound
    is loose (same rationale as the 2-level guard)."""
    model, variables, labels, Ttop = _tiny_model(dtype=jnp.bfloat16)
    tk, temp = (16, 16, 16), (0.9, 0.9, 0.9)
    key = jax.random.PRNGKey(7)
    ref = make_multilevel_sampler(model, Ttop, top_k=tk, temperature=temp,
                                  attention='packed')
    t_f, m_f, b_f = ref(variables, key, labels)

    # calibrate on the sampled codes via the training forward
    from hqtransformer_tpu.models.stage1.layers import (
        int8_calibration_scope, int8_scales_from_calib)
    h_top = 4
    codes = [t_f, cells_to_level(m_f, h_top, 2),
             cells_to_level(b_f, h_top, 4)]
    with int8_calibration_scope():
        _, col = model.apply(variables, codes, labels,
                             mutable=['int8_calib'])
    vars_q = {**variables,
              'act_scales': int8_scales_from_calib(col['int8_calib'])}

    os.environ['HQT_INT8_STAGE2'] = '1'
    os.environ['HQT_INT8_SPATIAL'] = '1'
    try:
        q8 = make_multilevel_sampler(model, Ttop, top_k=tk,
                                     temperature=temp, attention='packed')
        t_q, m_q, b_q = q8(vars_q, key, labels)
    finally:
        os.environ['HQT_INT8_STAGE2'] = '0'
        os.environ['HQT_INT8_SPATIAL'] = '0'

    assert t_q.shape == t_f.shape and b_q.shape == b_f.shape
    assert _agreement(t_q, t_f) > 0.5, _agreement(t_q, t_f)
    assert _agreement(m_q, m_f) > 0.5, _agreement(m_q, m_f)
    assert _agreement(b_q, b_f) > 0.5, _agreement(b_q, b_f)


def test_twostage_int8max_level3_surface():
    """The exact calibration + sampling sequence measure_throughput.py runs
    for `serving=int8max code_levels=3`, on a tiny 3-level TwoStageModel:
    calibrate_kv_scales -> calibrate_int8_decode -> calibrate_stage2_int8
    -> int8-cache packed sampling -> finite pixels."""
    from hqtransformer_tpu.config import build_twostage_config
    from hqtransformer_tpu.models.twostage import TwoStageModel

    cfg = build_twostage_config(os.path.join(
        os.path.dirname(__file__), '..', 'configs', 'imagenet', 'stage2',
        'hqtransformer-l12-top8x8.yaml'))
    # shrink to the demo_e2e --tiny --code-level 3 shape
    cfg.dataset.image_resolution = 64
    cfg.stage1.type = 'hqvae'
    cfg.stage1.hparams_aux.code_levels = 3
    cfg.stage1.hparams.resolution = 64
    cfg.stage1.hparams.ch = 32
    cfg.stage1.hparams.ch_mult = [1, 2]
    cfg.stage1.hparams.z_channels = 64
    cfg.stage1.hparams.attn_resolutions = [16]
    cfg.stage1.embed_dim = 64
    cfg.stage1.n_embed = 64
    cfg.stage1.n_embed_levels = [64] * 3
    cfg.stage2.type = 'multilevel-hq'
    cfg.stage2.decoding_type = 'parallel-add'
    cfg.stage2.vocab_sizes_img = [64] * 3
    cfg.stage2.hparams.embed_dim = 64
    cfg.stage2.hparams.n_layers = 2
    cfg.stage2.hparams.n_heads = 4
    cfg.stage2.hparams.ctx_len_img = 16

    model = TwoStageModel(cfg, dtype=jnp.bfloat16)
    variables = model.init_variables(jax.random.PRNGKey(0))
    Ttop = model.top_res * model.top_res
    labels = jnp.zeros((8,), jnp.int32)

    variables = model.calibrate_kv_scales(variables, jax.random.PRNGKey(2),
                                          labels, max_seq_len=Ttop)
    _, (t0_, m0_, b0_) = model.make_pixel_sampler_multilevel(
        max_seq_len=Ttop)(variables, jax.random.PRNGKey(3), labels)
    tr = model.top_res
    mid_map = cells_to_level(m0_, tr, 2)
    bot_map = cells_to_level(b0_, tr, 4)
    os.environ['HQT_INT8_DECODE'] = '1'
    os.environ['HQT_INT8_STAGE2'] = '1'
    os.environ['HQT_INT8_SPATIAL'] = '1'
    try:
        variables = model.calibrate_int8_decode(
            variables, [t0_.reshape(-1, tr, tr),
                        mid_map.reshape(-1, tr * 2, tr * 2),
                        bot_map.reshape(-1, tr * 4, tr * 4)])
        variables = model.calibrate_stage2_int8(
            variables, [t0_, mid_map, bot_map], labels)
        sampler = model.make_pixel_sampler_multilevel(
            max_seq_len=Ttop, cache_dtype=jnp.int8, attention='packed')
        pixels, _ = sampler(variables, jax.random.PRNGKey(4), labels)
    finally:
        os.environ['HQT_INT8_DECODE'] = '0'
        os.environ['HQT_INT8_STAGE2'] = '0'
        os.environ['HQT_INT8_SPATIAL'] = '0'
    px = np.asarray(pixels, np.float32)
    assert px.shape[0] == 8 and np.isfinite(px).all()
    assert (px >= 0).all() and (px <= 1).all()
