"""Stage-1 HQ-VAE training: recon + LPIPS + PatchGAN losses with adaptive
discriminator weight, EMA codebook updates, and the two-optimizer GAN step.

TPU re-design of the `VQGAN` LightningModule + `VQLPIPSWithDiscriminator`
(`hqvae/models/stage1/vqgan.py:14-148`, `discriminator.py:35-212`):

* the adaptive weight d_weight = ||grad nll|| / (||grad g|| + 1e-4) w.r.t.
  the decoder's LAST conv kernel (`discriminator.py:72-83`) is computed with
  ONE `jax.vjp` over a head function that re-applies only conv_out + losses
  to the cached pre-conv_out features — the forward is shared between the
  loss and both gradients (torch pays two retain_graph backwards);
* EMA codebook statistics update inside the generator forward through the
  mutable 'ema' collection, psum'd over the data axis when a mesh is used;
* faithful mode runs the generator forward again for the discriminator step
  (Lightning invokes training_step once per optimizer, so the reference
  updates EMA stats twice per batch and feeds the disc post-update
  reconstructions); fast mode reuses the generator-phase reconstruction,
  halving stage-1 step cost at the price of one-step-stale fakes.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Stage1HparamsDisc, Stage1TrainConfig
from ..models.stage1.layers import NLayerDiscriminator
from ..models.stage1.lpips import LPIPS


def hinge_d_loss(logits_real, logits_fake):
    """(`discriminator.py:21-25`)"""
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real)) +
                  jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    """(`discriminator.py:28-32`)"""
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real)) +
                  jnp.mean(jax.nn.softplus(logits_fake)))


def adopt_weight(weight, global_step, threshold: int):
    """disc warmup gate (`discriminator.py:15-18`), traced-step safe."""
    return jnp.where(global_step < threshold, 0.0, weight)


class Stage1State(NamedTuple):
    step: jax.Array
    gen_params: Any
    ema: Any
    disc_params: Any
    gen_opt_state: Any
    disc_opt_state: Any


def make_discriminator(hd: Stage1HparamsDisc, dtype=jnp.float32):
    return NLayerDiscriminator(input_nc=hd.disc_in_channels,
                               n_layers=hd.disc_num_layers,
                               norm_type=hd.norm_type, dtype=dtype)


def _conv_out(h_pre, kernel, bias):
    """Re-apply the decoder's final 3x3 SAME conv (matches nn.Conv; under
    bf16 training h_pre is bf16 and the f32 params are cast like flax's
    dtype machinery would)."""
    y = jax.lax.conv_general_dilated(
        h_pre, kernel.astype(h_pre.dtype), window_strides=(1, 1),
        padding=[(1, 1)] * 2,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y + bias.astype(h_pre.dtype)


def make_stage1_train_step(generator, discriminator,
                           lpips: Optional[LPIPS],
                           gen_optimizer, disc_optimizer,
                           hd: Stage1HparamsDisc,
                           *,
                           bottom_start: Optional[int] = None,
                           residual_l1_weight: float = 0.0,
                           disc_loss_type: str = 'hinge',
                           disc_factor: float = 1.0,
                           perceptual_weight: float = 1.0,
                           faithful_double_forward: bool = True,
                           axis_name: Optional[str] = None):
    """Build the pure two-phase GAN train step.

    step(state, lpips_vars, x, rng) -> (state', metrics). `x`: NHWC in
    [-1, 1]. `bottom_start` selects the curriculum branch statically
    (compile twice when crossing it, like the reference's runtime branch
    `generator.py:266-275`).
    """
    d_loss_fn = hinge_d_loss if disc_loss_type == 'hinge' else vanilla_d_loss
    gen_cls = type(generator)
    use_bypass = bottom_start is not None and bottom_start > 0

    def _generator_forward(gen_params, ema, x, rng, bypass: bool):
        """Run encode + decode(ret_pre_out) with EMA mutation. Returns
        (h_pres, qloss_terms, resid_metric, new_ema)."""
        variables = {'params': gen_params, 'ema': ema}
        rngs = {'restart': rng} if rng is not None else None
        name = gen_cls.__name__
        if name in ('SimRQGAN2Generator', 'VQGAN2Generator'):
            (quant_t, quant_b, diff_t, diff_b, code), mut = generator.apply(
                variables, x, update_ema=True, mutable=['ema'], rngs=rngs,
                method=gen_cls.encode)
            decs = []
            h_pre = generator.apply(variables, quant_t, quant_b, True, True,
                                    method=gen_cls.decode)[1]
            decs.append(h_pre)
            if bypass:
                h_pre_t = generator.apply(variables, quant_t,
                                          jnp.zeros_like(quant_b), True,
                                          True, method=gen_cls.decode)[1]
                decs.append(h_pre_t)
            resid = (jnp.mean(jnp.abs(code[2]))
                     if name == 'SimRQGAN2Generator' else jnp.zeros(()))
            return decs, [diff_t, diff_b], resid, mut['ema']
        if name == 'HQVAEGenerator':
            (quant, diffs, codes, resids), mut = generator.apply(
                variables, x, update_ema=True, mutable=['ema'], rngs=rngs,
                method=gen_cls.encode)
            h_pre = generator.apply(variables, quant, True, True,
                                    method=gen_cls.decode)[1]
            resid = sum(jnp.mean(r) for r in resids)
            return [h_pre], list(diffs), resid, mut['ema']
        # VQGANGenerator
        (quant, diff, code), mut = generator.apply(
            variables, x, update_ema=True, mutable=['ema'], rngs=rngs,
            method=gen_cls.encode)
        h_pre = generator.apply(variables, quant, True, True,
                                method=gen_cls.decode)[1]
        return [h_pre], [diff], jnp.zeros(()), mut['ema']

    def _nll_and_g(decs, x, disc_params, lpips_vars):
        """nll (rec + perceptual) and generator-adversarial loss from decoded
        images (`discriminator.py:87-140`). decs: [dec_tb] or
        [dec_tb, dec_t]."""
        # losses always reduce in f32 (bf16 modules emit bf16 images; the
        # sub-modules re-cast their own inputs, so this only pins the loss
        # arithmetic, mirroring the reference's autocast-exempt loss scalars)
        decs = [d.astype(jnp.float32) for d in decs]
        dec_tb = decs[0]
        if len(decs) > 1:
            dec_t = decs[1]
            if hd.use_recon_top:
                rec = 0.5 * (jnp.mean(jnp.square(x - dec_t)) +
                             jnp.mean(jnp.square(x - dec_tb)))
            else:
                rec = jnp.mean(jnp.square(x - dec_tb))
        else:
            rec = jnp.mean(jnp.square(x - dec_tb))
        if lpips is not None and perceptual_weight > 0:
            p_loss = lpips.apply(lpips_vars, x, dec_tb).astype(jnp.float32)
            if len(decs) > 1 and hd.use_perceptual_top:
                p_loss = 0.5 * (p_loss + lpips.apply(
                    lpips_vars, x, decs[1]).astype(jnp.float32))
        else:
            p_loss = jnp.zeros(())
        nll = rec + perceptual_weight * p_loss

        def g_of(d):
            logits = discriminator.apply({'params': disc_params}, d)
            return -jnp.mean(logits.astype(jnp.float32))
        if len(decs) > 1 and hd.use_adversarial_top:
            g_loss = 0.5 * (g_of(decs[1]) + g_of(dec_tb))
        else:
            g_loss = g_of(dec_tb)
        return nll, g_loss, rec, p_loss

    def gen_loss_fn(gen_params, ema, disc_params, lpips_vars, x, rng, step):
        decs_pre, qdiffs, resid, new_ema = _generator_forward(
            gen_params, ema, x, rng, use_bypass)
        w_last = gen_params['decoder']['conv_out']['kernel']
        b_last = gen_params['decoder']['conv_out']['bias']

        def head(w):
            decs = [_conv_out(h, w, b_last) for h in decs_pre]
            nll, g_loss, rec, p = _nll_and_g(decs, x, disc_params, lpips_vars)
            return (nll, g_loss), (rec, p, decs)

        (nll, g_loss), vjp_fn, (rec, p_loss, decs) = jax.vjp(
            head, w_last, has_aux=True)
        grad_nll = vjp_fn((jnp.ones(()), jnp.zeros(())))[0]
        grad_g = vjp_fn((jnp.zeros(()), jnp.ones(())))[0]
        d_weight = jnp.linalg.norm(grad_nll.reshape(-1)) / \
            (jnp.linalg.norm(grad_g.reshape(-1)) + 1e-4)
        d_weight = jax.lax.stop_gradient(
            jnp.clip(d_weight, 0.0, 1e4)) * hd.disc_weight

        factor = adopt_weight(disc_factor, step, hd.disc_start)
        qloss = sum(qdiffs)
        loss = nll + d_weight * factor * g_loss + hd.codebook_weight * qloss
        if residual_l1_weight > 0.0:
            loss = loss + residual_l1_weight * resid
        metrics = {'total_loss': loss, 'quant_loss': qloss, 'nll_loss': nll,
                   'rec_loss': rec, 'p_loss': p_loss, 'd_weight': d_weight,
                   'disc_factor': factor, 'g_loss': g_loss,
                   'resid_l1_loss': resid}
        return loss, (new_ema, metrics, jax.lax.stop_gradient(decs[0]))

    def disc_loss_fn(disc_params, fake, x, step):
        logits_real = discriminator.apply({'params': disc_params},
                                          x).astype(jnp.float32)
        logits_fake = discriminator.apply(
            {'params': disc_params},
            jax.lax.stop_gradient(fake)).astype(jnp.float32)
        factor = adopt_weight(disc_factor, step, hd.disc_start)
        d_loss = factor * d_loss_fn(logits_real, logits_fake)
        return d_loss, {'disc_loss': d_loss,
                        'logits_real': logits_real.mean(),
                        'logits_fake': logits_fake.mean()}

    def train_step(state: Stage1State, lpips_vars, x, rng):
        rng_a, rng_b = (jax.random.split(rng) if rng is not None
                        else (None, None))
        # phase A: autoencoder/generator update (optimizer_idx == 0)
        (loss, (ema, metrics, fake)), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params, state.ema,
                                       state.disc_params, lpips_vars, x,
                                       rng_a, state.step)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, gen_opt_state = gen_optimizer.update(
            grads, state.gen_opt_state, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, updates)

        # phase B: discriminator update (optimizer_idx == 1)
        if faithful_double_forward:
            decs_pre, _, _, ema = _generator_forward(gen_params, ema, x,
                                                     rng_b, use_bypass)
            w = gen_params['decoder']['conv_out']['kernel']
            b = gen_params['decoder']['conv_out']['bias']
            fake = _conv_out(decs_pre[0], w, b)
        (d_loss, d_metrics), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params, fake, x,
                                        state.step)
        if axis_name is not None:
            d_grads = jax.lax.pmean(d_grads, axis_name)
        d_updates, disc_opt_state = disc_optimizer.update(
            d_grads, state.disc_opt_state, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        metrics.update(d_metrics)
        new_state = Stage1State(state.step + 1, gen_params, ema, disc_params,
                                gen_opt_state, disc_opt_state)
        return new_state, metrics

    return train_step


def make_stage1_optimizer(opt_cfg, schedule, accum_steps: int = 1):
    """Adam (`vqgan.py:101-109`) with optional global-norm clipping and
    optional gradient accumulation (optax.MultiSteps), matching the
    reference's `grad_accm_steps` (`main_stage1.py:82-86`)."""
    txs = []
    if opt_cfg.grad_clip_norm and opt_cfg.grad_clip_norm > 0:
        txs.append(optax.clip_by_global_norm(opt_cfg.grad_clip_norm))
    betas = opt_cfg.betas or [0.9, 0.999]
    txs.append(optax.adam(learning_rate=schedule, b1=betas[0], b2=betas[1]))
    tx = optax.chain(*txs)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
