"""Stage-1 parity: random-init torch reference models -> converter -> flax,
codes must bit-match and reconstructions must be allclose.

This simultaneously validates the conv stack, the quantizers, the resampling
ops' channel orderings, and the torch->flax checkpoint converter — the chain
a released reference checkpoint travels when loaded into this framework.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import Stage1Config, Stage1Hparams, VQGAN2Hparams
from hqtransformer_tpu.checkpoint import convert_torch_state_dict
from hqtransformer_tpu.models.stage1.generator import (
    SimRQGAN2Generator, VQGANGenerator, HQVAEGenerator)
from reference_loader import NSDict, ref_module


def tiny_hparams(**over):
    hp = dict(double_z=False, z_channels=64, resolution=32, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
              attn_resolutions=[8], pdrop=0.0, use_init_downsample=True,
              use_mid_block=True, use_attn=True)
    hp.update(over)
    return hp


def to_jax_hparams(hp):
    return Stage1Hparams(**hp)


def _convert_and_compare(torch_model, jax_model, x_np, forward_jax,
                         forward_torch, atol=2e-4):
    torch_model.eval()
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    x_jax = jnp.asarray(np.transpose(x_np, (0, 2, 3, 1)))
    variables = jax_model.init(jax.random.PRNGKey(0), x_jax)
    variables = convert_torch_state_dict(sd, variables)

    with torch.no_grad():
        t_out = forward_torch(torch_model, torch.from_numpy(x_np))
    j_out = forward_jax(jax_model, variables, x_jax)
    return t_out, j_out, atol


@pytest.mark.parametrize('upsample', ['pixelshuffle', 'nearest', 'conv2'])
def test_simrqgan2_parity(upsample):
    ref_gen = ref_module('hqvae.models.stage1.generator')
    hp = tiny_hparams()
    aux = dict(upsample=upsample, shared_codebook=False,
               bottom_start=10**11, decoding_type='concat',
               restart_unused_codes=None, code_levels=None)

    torch.manual_seed(0)
    tm = ref_gen.SimRQGAN2Generator(n_embed=128, embed_dim=64,
                                    ema_update=True, hparams=NSDict(hp),
                                    hparams_aux=NSDict(aux))
    jm = SimRQGAN2Generator(n_embed=128, embed_dim=64, ema_update=True,
                            hparams=to_jax_hparams(hp),
                            hparams_aux=VQGAN2Hparams(**aux))

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)

    def fw_torch(m, xt):
        dec, diff, code = m(xt)
        return dec.numpy(), code[0].numpy(), code[1].numpy()

    def fw_jax(m, v, xj):
        dec, diff, code = m.apply(v, xj)
        return (np.transpose(np.asarray(dec), (0, 3, 1, 2)),
                np.asarray(code[0]).reshape(-1),
                np.asarray(code[1]).reshape(-1))

    (t_dec, t_ct, t_cb), (j_dec, j_ct, j_cb), atol = _convert_and_compare(
        tm, jm, x, fw_jax, fw_torch)

    np.testing.assert_array_equal(t_ct, j_ct)
    np.testing.assert_array_equal(t_cb, j_cb)
    np.testing.assert_allclose(t_dec, j_dec, atol=atol, rtol=1e-3)


def test_simrqgan2_decode_code_parity():
    ref_gen = ref_module('hqvae.models.stage1.generator')
    hp = tiny_hparams()
    aux = dict(upsample='pixelshuffle', shared_codebook=False,
               bottom_start=10**11, decoding_type='concat',
               restart_unused_codes=None, code_levels=None)
    torch.manual_seed(3)
    tm = ref_gen.SimRQGAN2Generator(n_embed=128, embed_dim=64,
                                    ema_update=True, hparams=NSDict(hp),
                                    hparams_aux=NSDict(aux))
    tm.eval()
    jm = SimRQGAN2Generator(n_embed=128, embed_dim=64, ema_update=True,
                            hparams=to_jax_hparams(hp),
                            hparams_aux=VQGAN2Hparams(**aux))
    x = jnp.zeros((1, 32, 32, 3))
    variables = jm.init(jax.random.PRNGKey(0), x)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_torch_state_dict(sd, variables)

    rng = np.random.RandomState(0)
    ct = rng.randint(0, 128, (2, 4, 4))
    cb = rng.randint(0, 128, (2, 8, 8))

    for args_t, args_j in [((torch.from_numpy(ct), torch.from_numpy(cb)),
                            (jnp.asarray(ct), jnp.asarray(cb))),
                           ((torch.from_numpy(ct), None),
                            (jnp.asarray(ct), None)),
                           ((None, torch.from_numpy(cb)),
                            (None, jnp.asarray(cb)))]:
        with torch.no_grad():
            t_dec = tm.decode_code(*args_t).numpy()
        j_dec = jm.apply(variables, *args_j, method=jm.decode_code)
        j_dec = np.transpose(np.asarray(j_dec), (0, 3, 1, 2))
        np.testing.assert_allclose(t_dec, j_dec, atol=2e-4, rtol=1e-3)


def test_vqgan_parity():
    ref_gen = ref_module('hqvae.models.stage1.generator')
    hp = tiny_hparams(use_init_downsample=False, attn_resolutions=[16])
    torch.manual_seed(1)
    tm = ref_gen.VQGANGenerator(n_embed=128, embed_dim=64, ema_update=False,
                                hparams=NSDict(hp))
    jm = VQGANGenerator(n_embed=128, embed_dim=64, ema_update=False,
                        hparams=to_jax_hparams(hp))
    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)

    def fw_torch(m, xt):
        dec, diff, code = m(xt)
        return dec.numpy(), code.numpy()

    def fw_jax(m, v, xj):
        dec, diff, code = m.apply(v, xj)
        return (np.transpose(np.asarray(dec), (0, 3, 1, 2)),
                np.asarray(code).reshape(-1))

    (t_dec, t_c), (j_dec, j_c), atol = _convert_and_compare(
        tm, jm, x, fw_jax, fw_torch)
    np.testing.assert_array_equal(t_c, j_c)
    np.testing.assert_allclose(t_dec, j_dec, atol=atol, rtol=1e-3)


def test_hqvae_3level_parity():
    ref_gen = ref_module('hqvae.models.stage1.generator')
    hp = tiny_hparams(ch_mult=[1, 2], attn_resolutions=[16])
    aux = dict(upsample='pixelshuffle', shared_codebook=False,
               bottom_start=10**11, decoding_type='concat',
               restart_unused_codes=False, code_levels=3)
    torch.manual_seed(5)
    tm = ref_gen.HQVAEGenerator(n_embed_levels=[64, 96, 128], embed_dim=32,
                                ema_update=True, hparams=NSDict(hp),
                                hparams_aux=NSDict(aux))
    jm = HQVAEGenerator(n_embed_levels=[64, 96, 128], embed_dim=32,
                        ema_update=True, hparams=to_jax_hparams(hp),
                        hparams_aux=VQGAN2Hparams(**aux))
    rng = np.random.RandomState(4)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)

    def fw_torch(m, xt):
        dec, diffs, codes = m(xt)
        return dec.numpy(), [c.numpy() for c in codes[:-1]]

    def fw_jax(m, v, xj):
        dec, diffs, codes = m.apply(v, xj)
        return (np.transpose(np.asarray(dec), (0, 3, 1, 2)),
                [np.asarray(c).reshape(-1) for c in codes[:-1]])

    (t_dec, t_codes), (j_dec, j_codes), atol = _convert_and_compare(
        tm, jm, x, fw_jax, fw_torch)
    for tc, jc in zip(t_codes, j_codes):
        np.testing.assert_array_equal(tc, jc)
    np.testing.assert_allclose(t_dec, j_dec, atol=atol, rtol=1e-3)
