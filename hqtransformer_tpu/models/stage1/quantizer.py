"""Flax quantizer modules wrapping the functional VQ ops.

Re-designs of `hqvae/models/stage1/modules/quantizer.py:15-186`:

* `VectorQuantizer` — learned codebook, straight-through estimator,
  commitment + codebook loss (`quantizer.py:15-51`).
* `EMAVectorQuantizer` — codebook kept in a mutable flax collection `'ema'`
  (the torch version registers buffers, `quantizer.py:79-81`); the EMA update
  is applied only when the caller passes `update_ema=True` and runs `apply`
  with `mutable=['ema']`, making single-device training work without a
  process group (unlike the reference's unconditional all_reduce,
  `quantizer.py:111-112`) and multi-device training a `psum` over
  `ema_axis_name`.

Inputs are channel-last ([B, H, W, D]); codes come back as [B, H, W].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import quantize as q


class VectorQuantizer(nn.Module):
    """Learned-codebook VQ (`quantizer.py:15-51`)."""
    n_embed: int
    dim: int
    beta: float = 0.25
    use_pallas: Optional[bool] = None

    def setup(self):
        # uniform(-1/K, 1/K) init (`quantizer.py:26`)
        scale = 1.0 / self.n_embed
        self.embedding = self.param(
            'embedding',
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -scale, scale),
            (self.n_embed, self.dim))

    def __call__(self, z: jax.Array, **_) -> Tuple[jax.Array, jax.Array, jax.Array]:
        codes, z_q = q.quantize_lookup(z, self.embedding,
                                       use_pallas=self.use_pallas)
        loss = q.commitment_loss(z, z_q, self.beta) + \
            jnp.mean(jnp.square(z_q - jax.lax.stop_gradient(z)))
        z_q = q.straight_through(z, z_q)
        return z_q, loss, codes

    def get_codebook_entry(self, indices: jax.Array) -> jax.Array:
        return jnp.take(self.embedding, indices, axis=0)

    def get_soft_codes(self, z, temp: float = 1.0, stochastic: bool = False,
                       rng: Optional[jax.Array] = None):
        flat = z.reshape(-1, z.shape[-1])
        codes, soft = q.soft_codes(flat, self.embedding, temp,
                                   stochastic=stochastic, key=rng)
        z_q = jnp.take(self.embedding, codes, axis=0).reshape(z.shape)
        loss = q.commitment_loss(z, z_q, self.beta)
        z_q = q.straight_through(z, z_q)
        return z_q, loss, codes.reshape(z.shape[:-1]), \
            soft.reshape(z.shape[:-1] + (self.n_embed,))


class EMAVectorQuantizer(nn.Module):
    """EMA-codebook VQ (`quantizer.py:54-186`)."""
    n_embed: int
    dim: int
    beta: float = 0.25
    decay: float = 0.99
    eps: float = 1e-5
    use_l2_norm: bool = False
    restart_unused_codes: bool = False
    ema_axis_name: Optional[str] = None
    use_pallas: Optional[bool] = None

    def setup(self):
        # one shared init draw so embedding == embedding_avg at t0
        if self.is_initializing():
            key = self.make_rng('params')
            state = q.init_ema_state(key, self.n_embed, self.dim,
                                     self.use_l2_norm)
        else:
            state = q.EMAState(jnp.zeros((self.n_embed, self.dim)),
                               jnp.zeros((self.n_embed,)),
                               jnp.zeros((self.n_embed, self.dim)))
        self.v_embedding = self.variable('ema', 'embedding',
                                         lambda: state.embedding)
        self.v_cluster_size = self.variable('ema', 'cluster_size',
                                            lambda: state.cluster_size)
        self.v_embedding_avg = self.variable('ema', 'embedding_avg',
                                             lambda: state.embedding_avg)

    @property
    def embedding(self) -> jax.Array:
        return self.v_embedding.value

    def _normalize(self, flat: jax.Array) -> jax.Array:
        return q._l2_normalize(flat) if self.use_l2_norm else flat

    def __call__(self, z: jax.Array, update_ema: bool = False
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        flat = self._normalize(z.reshape(-1, z.shape[-1]))
        codes = q.vq_lookup(flat, self.embedding, use_pallas=self.use_pallas)
        z_q = jnp.take(self.embedding, codes, axis=0).reshape(z.shape)
        codes = codes.reshape(z.shape[:-1])

        if update_ema:
            restart_key = (self.make_rng('restart')
                           if self.restart_unused_codes else None)
            state = q.EMAState(self.v_embedding.value,
                               self.v_cluster_size.value,
                               self.v_embedding_avg.value)
            new_state = q.ema_update(
                state, jax.lax.stop_gradient(flat),
                codes.reshape(-1),
                decay=self.decay, eps=self.eps,
                use_l2_norm=self.use_l2_norm,
                restart_unused_codes=self.restart_unused_codes,
                restart_key=restart_key,
                axis_name=self.ema_axis_name)
            self.v_embedding.value = new_state.embedding
            self.v_cluster_size.value = new_state.cluster_size
            self.v_embedding_avg.value = new_state.embedding_avg

        diff = q.commitment_loss(z, z_q, self.beta)
        z_q = q.straight_through(z, z_q)
        return z_q, diff, codes

    def get_codebook_entry(self, indices: jax.Array) -> jax.Array:
        return jnp.take(self.embedding, indices, axis=0)

    def get_soft_codes(self, z, temp: float = 1.0, stochastic: bool = False,
                       rng: Optional[jax.Array] = None):
        flat = self._normalize(z.reshape(-1, z.shape[-1]))
        codes, soft = q.soft_codes(flat, self.embedding, temp,
                                   stochastic=stochastic, key=rng)
        z_q = jnp.take(self.embedding, codes, axis=0).reshape(z.shape)
        diff = q.commitment_loss(z, z_q, self.beta)
        z_q = q.straight_through(z, z_q)
        return z_q, diff, codes.reshape(z.shape[:-1]), \
            soft.reshape(z.shape[:-1] + (self.n_embed,))


def make_quantizer(ema_update: bool, dim: int, n_embed: int,
                   beta: float = 0.25, restart_unused_codes: bool = False,
                   ema_axis_name: Optional[str] = None,
                   use_pallas: Optional[bool] = None,
                   name: Optional[str] = None):
    if ema_update:
        return EMAVectorQuantizer(n_embed=n_embed, dim=dim, beta=beta,
                                  restart_unused_codes=restart_unused_codes,
                                  ema_axis_name=ema_axis_name,
                                  use_pallas=use_pallas, name=name)
    return VectorQuantizer(n_embed=n_embed, dim=dim, beta=beta,
                           use_pallas=use_pallas, name=name)
