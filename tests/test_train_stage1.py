"""Stage-1 GAN training step: runs, EMA codebooks move, both optimizers
update, the adaptive d_weight matches a torch autograd computation on the
same tiny setup, and the recon loss decreases when overfitting one batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import (OptConfig, Stage1Hparams,
                                      Stage1HparamsDisc, VQGAN2Hparams)
from hqtransformer_tpu.models.stage1.generator import SimRQGAN2Generator
from hqtransformer_tpu.train.scheduler import build_schedule
from hqtransformer_tpu.train.stage1 import (Stage1State, hinge_d_loss,
                                            make_discriminator,
                                            make_stage1_optimizer,
                                            make_stage1_train_step)


def tiny_setup(norm_type='gn', bottom_start=None, dtype=jnp.float32):
    hp = Stage1Hparams(z_channels=64, resolution=32, ch=32, ch_mult=[1, 2],
                       num_res_blocks=1, attn_resolutions=[8],
                       use_init_downsample=True)
    aux = VQGAN2Hparams(upsample='pixelshuffle', shared_codebook=False,
                        decoding_type='concat')
    gen = SimRQGAN2Generator(n_embed=64, embed_dim=64, ema_update=True,
                             hparams=hp, hparams_aux=aux, dtype=dtype)
    hd = Stage1HparamsDisc(disc_start=0, disc_weight=0.75,
                           disc_num_layers=2, norm_type=norm_type)
    disc = make_discriminator(hd, dtype=dtype)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3)) * 0.5
    gvars = gen.init(jax.random.PRNGKey(1), x)
    dvars = disc.init(jax.random.PRNGKey(2), x)

    schedule = build_schedule(1e-3, steps_per_epoch=10, final_steps=1000,
                              warmup_epoch=0.0)
    opt_cfg = OptConfig(betas=[0.5, 0.9], grad_clip_norm=0.0)
    g_opt = make_stage1_optimizer(opt_cfg, schedule)
    d_opt = make_stage1_optimizer(opt_cfg, schedule)

    step = make_stage1_train_step(gen, disc, None, g_opt, d_opt, hd,
                                  bottom_start=bottom_start,
                                  perceptual_weight=0.0,
                                  faithful_double_forward=True)
    state = Stage1State(jnp.zeros((), jnp.int32), gvars['params'],
                        gvars['ema'], dvars['params'],
                        g_opt.init(gvars['params']),
                        d_opt.init(dvars['params']))
    return gen, disc, step, state, x


def test_train_step_runs_and_updates():
    gen, disc, step, state, x = tiny_setup()
    jit_step = jax.jit(step)
    new_state, metrics = jit_step(state, None, x, jax.random.PRNGKey(3))

    for k in ('total_loss', 'rec_loss', 'quant_loss', 'g_loss', 'd_weight',
              'disc_loss', 'logits_real', 'logits_fake'):
        assert np.isfinite(float(metrics[k])), k

    # generator, discriminator params and EMA buffers all moved
    def changed(a, b):
        return any(not np.allclose(np.asarray(x1), np.asarray(x2))
                   for x1, x2 in zip(jax.tree.leaves(a), jax.tree.leaves(b)))
    assert changed(state.gen_params, new_state.gen_params)
    assert changed(state.disc_params, new_state.disc_params)
    assert changed(state.ema, new_state.ema)
    assert int(new_state.step) == 1


def test_overfit_one_batch_decreases_recon():
    gen, disc, step, state, x = tiny_setup()
    jit_step = jax.jit(step)
    first = None
    rng = jax.random.PRNGKey(4)
    for i in range(30):
        rng, k = jax.random.split(rng)
        state, metrics = jit_step(state, None, x, k)
        if first is None:
            first = float(metrics['rec_loss'])
    last = float(metrics['rec_loss'])
    assert last < first * 0.9, (first, last)


def test_bf16_train_step_f32_losses_and_converges():
    """main_stage1.py --bf16: bf16 activations with f32 params. Loss scalars
    must come out f32 (the loss arithmetic is autocast-exempt, like the
    reference's fp16 recipe), params stay f32, and one-batch overfitting
    still drives the recon loss down."""
    gen, disc, step, state, x = tiny_setup(dtype=jnp.bfloat16)
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state.gen_params))
    jit_step = jax.jit(step)
    first = None
    rng = jax.random.PRNGKey(6)
    for i in range(30):
        rng, k = jax.random.split(rng)
        state, metrics = jit_step(state, None, x, k)
        if first is None:
            for name in ('total_loss', 'rec_loss', 'disc_loss', 'g_loss'):
                assert metrics[name].dtype == jnp.float32, name
                assert np.isfinite(float(metrics[name])), name
            first = float(metrics['rec_loss'])
    last = float(metrics['rec_loss'])
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state.gen_params))
    assert last < first * 0.9, (first, last)


def test_bottom_bypass_branch_runs():
    gen, disc, step, state, x = tiny_setup(bottom_start=100)
    new_state, metrics = jax.jit(step)(state, None, x, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics['total_loss']))


def test_d_weight_matches_torch_autograd():
    """The vjp-based adaptive weight equals torch's two-backward computation
    on an equivalent tiny decoder head."""
    torch = pytest.importorskip('torch')
    rng = np.random.RandomState(0)
    h_pre = rng.randn(2, 8, 8, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 3).astype(np.float32) * 0.1
    b = rng.randn(3).astype(np.float32) * 0.1
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    dw = rng.randn(3, 3, 3, 8).astype(np.float32) * 0.1  # disc 3x3 conv

    # --- jax
    from hqtransformer_tpu.train.stage1 import _conv_out

    def head(wj):
        dec = _conv_out(jnp.asarray(h_pre), wj, jnp.asarray(b))
        nll = jnp.mean(jnp.square(jnp.asarray(x) - dec))
        logits = jax.lax.conv_general_dilated(
            dec, jnp.asarray(dw), (1, 1), [(1, 1)] * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return nll, -jnp.mean(logits)

    (nll_j, g_j), vjp = jax.vjp(head, jnp.asarray(w))
    gn = vjp((jnp.ones(()), jnp.zeros(())))[0]
    gg = vjp((jnp.zeros(()), jnp.ones(())))[0]
    d_weight_j = float(jnp.linalg.norm(gn.reshape(-1)) /
                       (jnp.linalg.norm(gg.reshape(-1)) + 1e-4))

    # --- torch (NCHW mirror)
    wt = torch.tensor(np.transpose(w, (3, 2, 0, 1)), requires_grad=True)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ht = torch.from_numpy(np.transpose(h_pre, (0, 3, 1, 2)))
    dwt = torch.from_numpy(np.transpose(dw, (3, 2, 0, 1)))
    dec = torch.nn.functional.conv2d(ht, wt, torch.from_numpy(b), padding=1)
    nll_t = torch.mean((xt - dec) ** 2)
    g_t = -torch.mean(torch.nn.functional.conv2d(dec, dwt, padding=1))
    gn_t = torch.autograd.grad(nll_t, wt, retain_graph=True)[0]
    gg_t = torch.autograd.grad(g_t, wt)[0]
    d_weight_t = float(torch.norm(gn_t) / (torch.norm(gg_t) + 1e-4))

    np.testing.assert_allclose(float(nll_j), float(nll_t), rtol=1e-5)
    np.testing.assert_allclose(float(g_j), float(g_t), rtol=1e-5)
    np.testing.assert_allclose(d_weight_j, d_weight_t, rtol=1e-4)
