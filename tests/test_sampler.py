"""Sampler correctness: the jit-compiled lax.scan decode path must be
self-consistent with the full-parallel training forward — greedy sampling
(temperature -> 0) step logits argmax == forward logits argmax at every
position. Combined with the forward-parity tests against torch, this pins the
whole decode path (KV cache, masks, incremental embeddings) to the reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import Stage2Hparams, parse_model_type
from hqtransformer_tpu.models.stage2.hierarchical import (HierarchicalGPT,
                                                          cells_to_raster)
from hqtransformer_tpu.models.stage2.transformer import IGPT, Transformer1d
from hqtransformer_tpu.sampling.engine import (SamplingParams,
                                               make_hierarchical_sampler,
                                               make_igpt_sampler,
                                               make_txt2img_sampler)

GREEDY = SamplingParams(temperature_top=1e-6, temperature_bot=1e-6)


def tiny_hparams(**over):
    hp = dict(embed_dim=64, n_layers=2, n_heads=4, n_dense_layers=2,
              ctx_len=None, ctx_len_img=16, ctx_len_txt=8, embd_pdrop=0.0,
              resid_pdrop=0.0, attn_pdrop=0.0, mlp_bias=True, attn_bias=True,
              gelu_use_approx=False, use_head_txt=True, n_classes=10,
              causal_attn=None, embedding_type='transformer1',
              position_embedding='1d', bottom_head_type='linear',
              use_random_order=False, rate_random_order=1.0)
    hp.update(over)
    return Stage2Hparams(**hp)


@pytest.mark.parametrize('model_type,embedding', [
    ('hq-transformer/parallel', 'transformer1'),
    ('hq-transformer/parallel', 'reduce'),
    ('hq-transformer', 'transformer1'),
    ('hq-transformer/bidirectional', 'transformer1'),
])
def test_greedy_sampler_matches_forward(model_type, embedding):
    spec = parse_model_type(model_type)
    model = HierarchicalGPT(vocab_size_top=64, vocab_size_bot=64,
                            vocab_size_txt=32, ratio_bot2top=4,
                            use_cls_cond=True, use_txt_cond=False,
                            model_type=spec,
                            hparams=tiny_hparams(embedding_type=embedding))
    B, Ttop = 2, 16
    labels = jnp.asarray([3, 7])
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, Ttop), jnp.int32),
                           jnp.zeros((B, Ttop * 4), jnp.int32), labels)

    sampler = make_hierarchical_sampler(model, max_seq_len=Ttop,
                                        params=GREEDY)
    codes_t, codes_b = sampler(variables, jax.random.PRNGKey(1), labels)
    assert codes_t.shape == (B, Ttop)
    assert codes_b.shape == (B, Ttop, 4)

    codes_b_raster = cells_to_raster(codes_b, 4, 2)
    logits_top, logits_bot = model.apply(variables, codes_t, codes_b_raster,
                                         labels)
    # forward argmax at each position == greedily sampled code
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits_top, -1)),
                                  np.asarray(codes_t))
    if spec.depth_mode != 'bidirectional':
        # bidirectional's sampling-time filtering quirk aside, bottoms also
        # match when depth logits are deterministic given the top
        np.testing.assert_array_equal(
            np.asarray(jnp.argmax(logits_bot, -1)),
            np.asarray(codes_b_raster))


def test_greedy_sampler_matches_forward_txt():
    spec = parse_model_type('hq-transformer/parallel')
    model = HierarchicalGPT(vocab_size_top=64, vocab_size_bot=64,
                            vocab_size_txt=32, ratio_bot2top=4,
                            use_cls_cond=False, use_txt_cond=True,
                            model_type=spec, hparams=tiny_hparams())
    B, Ttop = 2, 16
    texts = jax.random.randint(jax.random.PRNGKey(5), (B, 8), 0, 32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, Ttop), jnp.int32),
                           jnp.zeros((B, Ttop * 4), jnp.int32), texts)
    sampler = make_hierarchical_sampler(model, max_seq_len=Ttop,
                                        params=GREEDY)
    codes_t, codes_b = sampler(variables, jax.random.PRNGKey(1), texts)
    codes_b_raster = cells_to_raster(codes_b, 4, 2)
    logits_top, logits_bot, _ = model.apply(variables, codes_t,
                                            codes_b_raster, texts)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits_top, -1)),
                                  np.asarray(codes_t))
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits_bot, -1)),
                                  np.asarray(codes_b_raster))


def test_given_top_codes_teacher_forcing():
    spec = parse_model_type('hq-transformer/parallel')
    model = HierarchicalGPT(vocab_size_top=64, vocab_size_bot=64,
                            vocab_size_txt=32, ratio_bot2top=4,
                            use_cls_cond=True, use_txt_cond=False,
                            model_type=spec, hparams=tiny_hparams())
    B, Ttop = 2, 16
    labels = jnp.asarray([1, 2])
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, Ttop), jnp.int32),
                           jnp.zeros((B, Ttop * 4), jnp.int32), labels)
    given = jax.random.randint(jax.random.PRNGKey(9), (B, Ttop), 0, 64)
    sampler = make_hierarchical_sampler(model, max_seq_len=Ttop,
                                        params=GREEDY, use_given_top=True)
    codes_t, codes_b = sampler(variables, jax.random.PRNGKey(1), labels,
                               given)
    np.testing.assert_array_equal(np.asarray(codes_t), np.asarray(given))


def test_igpt_greedy_matches_forward():
    model = IGPT(vocab_size_img=64, use_cls_cond=True,
                 hparams=tiny_hparams())
    B, T = 2, 16
    labels = jnp.asarray([3, 9])
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, T), jnp.int32), labels)
    sampler = make_igpt_sampler(model, max_seq_len=T, temperature=1e-6)
    codes = sampler(variables, jax.random.PRNGKey(1), labels)
    logits = model.apply(variables, codes, labels)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits, -1)),
                                  np.asarray(codes))


def test_txt2img_greedy_matches_forward():
    model = Transformer1d(vocab_size_txt=32, vocab_size_img=64,
                          hparams=tiny_hparams())
    B, T, N = 2, 16, 8
    texts = jax.random.randint(jax.random.PRNGKey(3), (B, N), 0, 32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, T), jnp.int32), texts)
    sampler = make_txt2img_sampler(model, max_seq_len=T, temperature=1e-6)
    codes = sampler(variables, jax.random.PRNGKey(1), texts)
    logits_img, _ = model.apply(variables, codes, texts)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits_img, -1)),
                                  np.asarray(codes))


def test_sampler_deterministic_fixed_seed():
    spec = parse_model_type('hq-transformer/parallel')
    model = HierarchicalGPT(vocab_size_top=64, vocab_size_bot=64,
                            vocab_size_txt=32, ratio_bot2top=4,
                            use_cls_cond=True, use_txt_cond=False,
                            model_type=spec, hparams=tiny_hparams())
    B, Ttop = 2, 16
    labels = jnp.asarray([0, 5])
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, Ttop), jnp.int32),
                           jnp.zeros((B, Ttop * 4), jnp.int32), labels)
    sampler = make_hierarchical_sampler(
        model, max_seq_len=Ttop,
        params=SamplingParams(top_k_top=8, top_k_bot=8,
                              temperature_top=0.95, temperature_bot=0.95))
    a = sampler(variables, jax.random.PRNGKey(42), labels)
    b = sampler(variables, jax.random.PRNGKey(42), labels)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    c = sampler(variables, jax.random.PRNGKey(43), labels)
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0])) or \
        not np.array_equal(np.asarray(a[1]), np.asarray(c[1]))


def test_packed_attention_sampler_matches_einsum():
    """The packed-cache [L, T, B, D] sampler path (XLA oracle on CPU; the
    Pallas kernel on TPU) must produce the identical token stream to the
    per-head einsum path."""
    spec = parse_model_type('hq-transformer/parallel')
    model = HierarchicalGPT(vocab_size_top=64, vocab_size_bot=64,
                            vocab_size_txt=32, ratio_bot2top=4,
                            use_cls_cond=True, use_txt_cond=False,
                            model_type=spec, hparams=tiny_hparams())
    B, Ttop = 8, 16
    labels = jnp.arange(B, dtype=jnp.int32) % 10
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, Ttop), jnp.int32),
                           jnp.zeros((B, Ttop * 4), jnp.int32), labels)
    sp = SamplingParams(top_k_top=16, top_k_bot=16, temperature_top=0.9,
                        temperature_bot=0.9)
    key = jax.random.PRNGKey(5)
    s_ein = make_hierarchical_sampler(model, Ttop, sp, attention='einsum')
    s_pkd = make_hierarchical_sampler(model, Ttop, sp, attention='packed')
    t1, b1 = s_ein(variables, key, labels)
    t2, b2 = s_pkd(variables, key, labels)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_packed_attention_txt_prefix_matches_einsum():
    """Text conditioning exercises the packed PREFILL (multi-token prefix
    at cache_len 0) — streams must match the einsum path exactly."""
    spec = parse_model_type('hq-transformer/parallel')
    model = HierarchicalGPT(vocab_size_top=64, vocab_size_bot=64,
                            vocab_size_txt=32, ratio_bot2top=4,
                            use_cls_cond=False, use_txt_cond=True,
                            model_type=spec, hparams=tiny_hparams())
    B, Ttop, N = 8, 16, 8
    texts = jnp.ones((B, N), jnp.int32) * 3
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((B, Ttop), jnp.int32),
                           jnp.zeros((B, Ttop * 4), jnp.int32), texts)
    sp = SamplingParams(top_k_top=16, top_k_bot=16, temperature_top=0.9,
                        temperature_bot=0.9)
    key = jax.random.PRNGKey(7)
    t1, b1 = make_hierarchical_sampler(model, Ttop, sp,
                                       attention='einsum')(variables, key,
                                                           texts)
    t2, b2 = make_hierarchical_sampler(model, Ttop, sp,
                                       attention='packed')(variables, key,
                                                           texts)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_igpt_and_txt2img_packed_match_einsum():
    """The flat baselines also support packed caches (prefill + decode)."""
    from hqtransformer_tpu.models.stage2.transformer import (IGPT,
                                                             Transformer1d)
    from hqtransformer_tpu.sampling.engine import (make_igpt_sampler,
                                                   make_txt2img_sampler)
    B = 8
    key = jax.random.PRNGKey(11)

    ig = IGPT(vocab_size_img=64, use_cls_cond=True, hparams=tiny_hparams())
    labels = jnp.arange(B, dtype=jnp.int32) % 10
    v = ig.init(jax.random.PRNGKey(0), jnp.zeros((B, 16), jnp.int32), labels)
    a = make_igpt_sampler(ig, 16, top_k=16, temperature=0.9,
                          attention='einsum')(v, key, labels)
    b = make_igpt_sampler(ig, 16, top_k=16, temperature=0.9,
                          attention='packed')(v, key, labels)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    t1d = Transformer1d(vocab_size_txt=32, vocab_size_img=64,
                        hparams=tiny_hparams())
    texts = jnp.ones((B, 8), jnp.int32) * 2
    v = t1d.init(jax.random.PRNGKey(0), jnp.zeros((B, 16), jnp.int32), texts)
    a = make_txt2img_sampler(t1d, 16, top_k=16, temperature=0.9,
                             attention='einsum')(v, key, texts)
    b = make_txt2img_sampler(t1d, 16, top_k=16, temperature=0.9,
                             attention='packed')(v, key, texts)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
