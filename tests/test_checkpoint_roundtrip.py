"""torch -> flax -> torch round trip must reproduce the original
state_dict bit-exactly (modulo float32 casting)."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from hqtransformer_tpu.checkpoint import (convert_torch_state_dict,
                                          export_torch_state_dict)
from hqtransformer_tpu.config import Stage1Hparams, Stage2Hparams, \
    VQGAN2Hparams, parse_model_type
from hqtransformer_tpu.models.stage1.generator import SimRQGAN2Generator
from hqtransformer_tpu.models.stage2.hierarchical import HierarchicalGPT
from reference_loader import NSDict, ref_module


def test_stage1_roundtrip():
    ref_gen = ref_module('hqvae.models.stage1.generator')
    hp = dict(double_z=False, z_channels=64, resolution=32, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
              attn_resolutions=[8], pdrop=0.0, use_init_downsample=True,
              use_mid_block=True, use_attn=True)
    aux = dict(upsample='pixelshuffle', shared_codebook=False,
               bottom_start=10**11, decoding_type='concat',
               restart_unused_codes=None, code_levels=None)
    torch.manual_seed(0)
    tm = ref_gen.SimRQGAN2Generator(n_embed=64, embed_dim=64,
                                    ema_update=True, hparams=NSDict(hp),
                                    hparams_aux=NSDict(aux))
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    jm = SimRQGAN2Generator(n_embed=64, embed_dim=64, ema_update=True,
                            hparams=Stage1Hparams(**hp),
                            hparams_aux=VQGAN2Hparams(**aux))
    variables = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    variables = convert_torch_state_dict(sd, variables)
    back = export_torch_state_dict(variables)
    assert set(back) == set(sd), (set(sd) - set(back), set(back) - set(sd))
    for k in sd:
        np.testing.assert_array_equal(sd[k], back[k], err_msg=k)


def test_stage2_roundtrip():
    ref_h = ref_module('hqvae.models.stage2.hierarchical_ar')
    hp = dict(embed_dim=64, n_layers=2, n_heads=4, n_dense_layers=2,
              ctx_len=None, ctx_len_img=16, ctx_len_txt=8, embd_pdrop=0.0,
              resid_pdrop=0.0, attn_pdrop=0.0, mlp_bias=True, attn_bias=True,
              gelu_use_approx=False, use_head_txt=True, n_classes=10,
              causal_attn=None, embedding_type='transformer1',
              position_embedding='1d', bottom_head_type='linear',
              use_random_order=False, rate_random_order=1.0)
    torch.manual_seed(0)
    tm = ref_h.iHQGPT(vocab_size_top=64, vocab_size_bot=64,
                      vocab_size_txt=32, ratio_bot2top=4, use_cls_cond=True,
                      use_txt_cond=False, model_type='parallel',
                      hparams=NSDict(hp), hparams_dec=None)
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    jm = HierarchicalGPT(vocab_size_top=64, vocab_size_bot=64,
                         vocab_size_txt=32, ratio_bot2top=4,
                         use_cls_cond=True, use_txt_cond=False,
                         model_type=parse_model_type(
                             'hq-transformer/parallel'),
                         hparams=Stage2Hparams(**hp))
    variables = jm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16), jnp.int32),
                        jnp.zeros((1, 64), jnp.int32),
                        jnp.zeros((1,), jnp.int32))
    variables = convert_torch_state_dict(sd, variables)
    back = export_torch_state_dict(variables)
    assert set(back) == set(sd), (set(sd) - set(back), set(back) - set(sd))
    for k in sd:
        np.testing.assert_array_equal(sd[k], back[k], err_msg=k)
