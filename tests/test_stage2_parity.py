"""Stage-2 forward parity: torch iHQGPT (random init) -> converter -> flax
HierarchicalGPT; training logits must be allclose for every model type and
embedding mode the configs use.
"""

import copy

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import Stage2Hparams, parse_model_type
from hqtransformer_tpu.checkpoint import convert_torch_state_dict
from hqtransformer_tpu.models.stage2.hierarchical import HierarchicalGPT
from reference_loader import NSDict, ref_module


def tiny_hparams(**over):
    hp = dict(embed_dim=64, n_layers=2, n_heads=4, n_dense_layers=2,
              ctx_len=None, ctx_len_img=16, ctx_len_txt=8, embd_pdrop=0.0,
              resid_pdrop=0.0, attn_pdrop=0.0, mlp_bias=True, attn_bias=True,
              gelu_use_approx=False, use_head_txt=True, n_classes=10,
              causal_attn=None, embedding_type='transformer1',
              position_embedding='1d', bottom_head_type='linear',
              use_random_order=False, rate_random_order=1.0)
    hp.update(over)
    return hp


def build_pair(model_type='hq-transformer/parallel', use_cls=True,
               use_txt=False, ratio=4, **hp_over):
    ref_h = ref_module('hqvae.models.stage2.hierarchical_ar')
    hp = tiny_hparams(**hp_over)

    torch.manual_seed(0)
    t_type = model_type.split('/')[-1] if '/' in model_type else 'top2bot'
    tm = ref_h.iHQGPT(vocab_size_top=64, vocab_size_bot=64,
                      vocab_size_txt=32, ratio_bot2top=ratio,
                      use_cls_cond=use_cls, use_txt_cond=use_txt,
                      model_type=t_type, hparams=NSDict(hp),
                      hparams_dec=None)
    tm.eval()

    jm = HierarchicalGPT(vocab_size_top=64, vocab_size_bot=64,
                         vocab_size_txt=32, ratio_bot2top=ratio,
                         use_cls_cond=use_cls, use_txt_cond=use_txt,
                         model_type=parse_model_type(model_type),
                         hparams=Stage2Hparams(**hp), hparams_dec=None)
    return tm, jm


def convert(tm, jm, codes_t, codes_b, labels):
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(codes_t),
                        jnp.asarray(codes_b), jnp.asarray(labels))
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    return convert_torch_state_dict(sd, variables)


@pytest.mark.parametrize('model_type,embedding', [
    ('hq-transformer/parallel', 'transformer1'),
    ('hq-transformer/parallel', 'transformer2'),
    ('hq-transformer/parallel', 'reduce'),
    ('hq-transformer/parallel', 'multiple'),
    ('hq-transformer', 'transformer1'),              # top2bot
    ('hq-transformer/bidirectional', 'transformer1'),
])
def test_forward_parity_cls(model_type, embedding):
    tm, jm = build_pair(model_type, embedding_type=embedding)
    rng = np.random.RandomState(1)
    B, Ttop = 2, 16
    codes_t = rng.randint(0, 64, (B, Ttop))
    codes_b = rng.randint(0, 64, (B, Ttop * 4))
    labels = rng.randint(0, 10, (B,))

    variables = convert(tm, jm, codes_t, codes_b, labels)

    with torch.no_grad():
        t_top, t_bot = tm((torch.from_numpy(codes_t),
                           torch.from_numpy(codes_b)),
                          torch.from_numpy(labels))
    j_top, j_bot = jm.apply(variables, jnp.asarray(codes_t),
                            jnp.asarray(codes_b), jnp.asarray(labels))
    np.testing.assert_allclose(t_top.numpy(), np.asarray(j_top),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(t_bot.numpy(), np.asarray(j_bot),
                               atol=2e-4, rtol=1e-3)


def test_forward_parity_txt():
    tm, jm = build_pair(use_cls=False, use_txt=True)
    rng = np.random.RandomState(2)
    B, Ttop = 2, 16
    codes_t = rng.randint(0, 64, (B, Ttop))
    codes_b = rng.randint(0, 64, (B, Ttop * 4))
    texts = rng.randint(0, 32, (B, 8))

    variables = convert(tm, jm, codes_t, codes_b, texts)
    with torch.no_grad():
        t_top, t_bot, t_txt = tm((torch.from_numpy(codes_t),
                                  torch.from_numpy(codes_b)),
                                 torch.from_numpy(texts))
    j_top, j_bot, j_txt = jm.apply(variables, jnp.asarray(codes_t),
                                   jnp.asarray(codes_b), jnp.asarray(texts))
    np.testing.assert_allclose(t_top.numpy(), np.asarray(j_top),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(t_bot.numpy(), np.asarray(j_bot),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(t_txt.numpy(), np.asarray(j_txt),
                               atol=2e-4, rtol=1e-3)


def test_forward_parity_uncond_2d_ratio16():
    """FFHQ-style: unconditional, 2d position embedding; plus ratio 16
    ('parallel16' -> bot_win 4)."""
    tm, jm = build_pair('hq-transformer/parallel16', use_cls=False,
                        ratio=16, position_embedding='2d')
    rng = np.random.RandomState(3)
    B, Ttop = 2, 16
    codes_t = rng.randint(0, 64, (B, Ttop))
    codes_b = rng.randint(0, 64, (B, Ttop * 16))

    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(codes_t),
                        jnp.asarray(codes_b), None)
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    variables = convert_torch_state_dict(sd, variables)

    with torch.no_grad():
        t_top, t_bot = tm((torch.from_numpy(codes_t),
                           torch.from_numpy(codes_b)), None)
    j_top, j_bot = jm.apply(variables, jnp.asarray(codes_t),
                            jnp.asarray(codes_b), None)
    np.testing.assert_allclose(t_top.numpy(), np.asarray(j_top),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(t_bot.numpy(), np.asarray(j_bot),
                               atol=2e-4, rtol=1e-3)
