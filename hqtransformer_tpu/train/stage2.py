"""Stage-2 training: losses, AdamW with decay/no-decay split, train step.

Equivalent of the `ImageGPT2` Lightning module's training logic
(`hqvae/models/__init__.py:291-471`) as pure jax functions: frozen stage-1
code extraction under stop_gradient, weighted top/bottom (and text)
cross-entropies with optional soft targets, AdamW whose weight decay applies
only to Linear kernels (the minDALL-E param split,
`models/__init__.py:398-465`), warmup-cosine LR, global-norm clipping.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def log_prob_from_logits(x, axis=-1):
    """Numerically stable log-softmax with the reference's +1e-7 guard
    (`models/__init__.py:29-33`)."""
    m = jnp.max(x, axis=axis, keepdims=True)
    return x - m - jnp.log(jnp.sum(jnp.exp(x - m), axis=axis,
                                   keepdims=True) + 1e-7)


def soft_target_cross_entropy(logits, target, label_smoothing: float = 0.0):
    """CE against soft targets (`models/__init__.py:36-47`), mean-reduced
    in f32 (see cross_entropy)."""
    target = target.astype(jnp.float32)
    unif = jnp.ones_like(target) / target.shape[-1]
    target = label_smoothing * unif + (1 - label_smoothing) * target
    loss = jnp.sum(-target * log_prob_from_logits(
        logits.astype(jnp.float32), axis=-1), axis=-1)
    return loss.mean()


def cross_entropy(logits, codes):
    """Mean CE over all positions (F.cross_entropy on flattened logits).
    Always reduced in f32 — bf16-compute models emit bf16 logits and the
    log-softmax/mean must not accumulate at half precision."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, codes[..., None], axis=-1)[..., 0]
    return nll.mean()


def hierarchical_loss(logits, codes, softs, labels=None,
                      weight_bottom: float = 4.0,
                      weight_img: Optional[float] = None,
                      weight_txt: Optional[float] = None
                      ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """loss = CE(top) + w_bottom * CE(bot) [+ text CE with the compensated
    text weight] (`models/__init__.py:297-344`; the (1 + w_bottom) scale
    compensation at `:160-169`)."""
    logits_top, logits_bot = logits[0], logits[1]
    ct, cb = codes
    st, sb = softs if softs is not None else (None, None)
    if st is not None:
        loss_top = soft_target_cross_entropy(logits_top, st)
        loss_bot = soft_target_cross_entropy(logits_bot, sb)
    else:
        loss_top = cross_entropy(logits_top, ct)
        loss_bot = cross_entropy(logits_bot, cb)
    loss_img = loss_top + weight_bottom * loss_bot
    metrics = {'loss_top': loss_top, 'loss_bot': loss_bot,
               'loss_img': loss_img}
    if len(logits) > 2 and weight_txt is not None:
        logits_txt = logits[2]
        loss_txt = cross_entropy(logits_txt, labels[:, 1:])
        w_image = 1.0 + weight_bottom
        loss = loss_img * weight_img + loss_txt * (weight_txt * w_image)
        metrics['loss_txt'] = loss_txt
    else:
        loss = loss_img
    metrics['loss'] = loss
    return loss, metrics


def multilevel_loss(logits, codes, softs, labels=None,
                    weight_img: Optional[float] = None,
                    weight_txt: Optional[float] = None):
    """Per-level losses weighted 4**level (`models/__init__.py:319-338`)."""
    n_levels = len(codes)
    metrics = {}
    loss_img = 0.0
    for i in range(n_levels):
        s = softs[i] if softs is not None else None
        if s is not None:
            li = soft_target_cross_entropy(logits[i], s)
        else:
            li = cross_entropy(logits[i], codes[i])
        metrics[f'loss_level{i}'] = li
        loss_img = loss_img + (4 ** i) * li
    if len(logits) > n_levels and weight_txt is not None:
        loss_txt = cross_entropy(logits[-1], labels[:, 1:])
        loss = loss_img * weight_img + loss_txt * weight_txt
        metrics['loss_txt'] = loss_txt
    else:
        loss = loss_img
    metrics['loss'] = loss
    return loss, metrics


def decay_mask(params) -> Any:
    """True where weight decay applies: Linear/conv kernels only. Matches the
    reference split — biases, LayerNorm/Embedding weights and the bare
    sos/sos_depth/pos_emb_bot params are excluded
    (`models/__init__.py:403-432`)."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: kp[-1].key == 'kernel', params)


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def make_optimizer(opt_cfg, schedule, accum_steps: int = 1):
    """AdamW + decay mask + global-norm clip (`models/__init__.py:446-448`,
    grad_clip_norm in OptConfig). accum_steps > 1 wraps in optax.MultiSteps
    (the reference's Lightning accumulate_grad_batches,
    `main_stage1.py:82-86`)."""
    txs = []
    if opt_cfg.grad_clip_norm and opt_cfg.grad_clip_norm > 0:
        txs.append(optax.clip_by_global_norm(opt_cfg.grad_clip_norm))
    txs.append(optax.adamw(learning_rate=schedule,
                           b1=opt_cfg.betas[0], b2=opt_cfg.betas[1],
                           weight_decay=opt_cfg.weight_decay,
                           mask=decay_mask))
    tx = optax.chain(*txs)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def make_train_step(model2, stage1, optimizer, *,
                    weight_bottom: float = 4.0,
                    weight_img: Optional[float] = None,
                    weight_txt: Optional[float] = None,
                    temp_soft_labels: Optional[float] = None,
                    use_cond: bool = True,
                    multilevel: bool = False):
    """Build the pure stage-2 train step.

    step(state, stage1_variables, images, labels) -> (state', metrics).
    stage-1 is frozen: codes are extracted under stop_gradient
    (`models/__init__.py:171-174,245-255`).
    """

    def loss_fn(params, stage1_variables, images, labels):
        B = images.shape[0]
        cond = labels if use_cond else None
        if multilevel:
            if temp_soft_labels is not None:
                codes, softs = stage1.apply(
                    stage1_variables, images, temp_soft_labels,
                    method=type(stage1).get_soft_codes)
                codes = [jax.lax.stop_gradient(c.reshape(B, -1))
                         for c in codes]
                softs = [jax.lax.stop_gradient(
                    s.reshape(B, -1, s.shape[-1])) for s in softs]
            else:
                codes = stage1.apply(stage1_variables, images,
                                     method=type(stage1).get_codes)
                codes = [jax.lax.stop_gradient(c.reshape(B, -1))
                         for c in codes]
                softs = None
            logits = model2.apply({'params': params}, codes, cond)
            return multilevel_loss(logits, codes, softs, labels,
                                   weight_img=weight_img,
                                   weight_txt=weight_txt)
        if temp_soft_labels is not None:
            (ct, cb), (st, sb) = stage1.apply(
                stage1_variables, images, temp_soft_labels,
                method=type(stage1).get_soft_codes)
            ct = jax.lax.stop_gradient(ct.reshape(B, -1))
            cb = jax.lax.stop_gradient(cb.reshape(B, -1))
            softs = (jax.lax.stop_gradient(st.reshape(B, -1, st.shape[-1])),
                     jax.lax.stop_gradient(sb.reshape(B, -1, sb.shape[-1])))
        else:
            ct, cb = stage1.apply(stage1_variables, images,
                                  method=type(stage1).get_codes)
            ct = jax.lax.stop_gradient(ct.reshape(B, -1))
            cb = jax.lax.stop_gradient(cb.reshape(B, -1))
            softs = None
        logits = model2.apply({'params': params}, ct, cb, cond)
        return hierarchical_loss(logits, (ct, cb), softs, labels,
                                 weight_bottom=weight_bottom,
                                 weight_img=weight_img,
                                 weight_txt=weight_txt)

    def train_step(state: TrainState, stage1_variables, images, labels):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, stage1_variables, images,
                                   labels)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step
