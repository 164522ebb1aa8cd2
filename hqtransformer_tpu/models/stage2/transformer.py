"""Flat-sequence stage-2 baselines: class-conditional iGPT over top codes and
the text+image Transformer1d.

TPU re-designs of `hqvae/models/stage2/transformer.py:14-260`. Training
forwards are single parallel passes; cached decode steps are composed by
`sampling/engine.py` into `lax.scan` loops.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import Stage2Hparams
from ...ops import masks as M
from .layers import Block


def _normal_init(std=0.02):
    return nn.initializers.normal(stddev=std)


class IGPT(nn.Module):
    """Class-conditional GPT over the top-code raster (iGPT,
    `transformer.py:14-121`)."""
    vocab_size_img: int
    use_cls_cond: bool
    hparams: Stage2Hparams
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        hp = self.hparams
        D = hp.embed_dim
        if self.use_cls_cond:
            self.sos = nn.Embed(hp.n_classes, D, name='sos',
                                embedding_init=_normal_init())
        else:
            self.sos = self.param('sos', _normal_init(), (1, 1, D))
        self.tok_emb_img = nn.Embed(self.vocab_size_img, D,
                                    name='tok_emb_img',
                                    embedding_init=_normal_init())
        self.pos_emb_img = nn.Embed(hp.ctx_len_img, D, name='pos_emb_img',
                                    embedding_init=_normal_init())
        self.blocks = [
            Block(embed_dim=D, n_heads=hp.n_heads, mlp_bias=hp.mlp_bias,
                  attn_bias=hp.attn_bias, resid_pdrop=hp.resid_pdrop,
                  attn_pdrop=hp.attn_pdrop,
                  gelu_use_approx=hp.gelu_use_approx, dtype=self.dtype,
                  name=f'blocks_{i}') for i in range(hp.n_layers)]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, name='ln_f', dtype=self.dtype)
        self.head = nn.Dense(self.vocab_size_img, use_bias=False,
                             name='head', dtype=self.dtype)
        self.n_layers = hp.n_layers

    def sos_tokens(self, B: int, labels: Optional[jax.Array]) -> jax.Array:
        if self.use_cls_cond and labels is not None:
            return self.sos(labels)[:, None, :]
        return jnp.tile(self.sos, (B, 1, 1))

    def __call__(self, codes: jax.Array,
                 labels: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        """codes: [B, T] -> logits [B, T, V] (`transformer.py:99-113`)."""
        B, T = codes.shape
        pos = jnp.tile(jnp.arange(T)[None], (B, 1))
        h = self.tok_emb_img(codes) + self.pos_emb_img(pos)
        h = jnp.concatenate([self.sos_tokens(B, labels), h[:, :-1]], axis=1)
        mask = jnp.asarray(M.causal(T))
        for blk in self.blocks:
            h = blk(h, mask=mask, deterministic=deterministic)
        return self.head(self.ln_f(h))

    def embed_step(self, codes: jax.Array, pos: jax.Array) -> jax.Array:
        """Token embedding for one decode step: [B] -> [B, 1, D]."""
        return (self.tok_emb_img(codes) + self.pos_emb_img(pos))[:, None, :]

    def decode_step(self, x: jax.Array, k_cache, v_cache, cache_len):
        """One cached spatial step -> (logits [B, V], caches)."""
        for i, blk in enumerate(self.blocks):
            x, k_cache, v_cache = blk.step_stacked(x, k_cache, v_cache, i,
                                                   cache_len)
        logits = self.head(self.ln_f(x))[:, -1]
        return logits, k_cache, v_cache


class Transformer1d(nn.Module):
    """Single-stream text+image GPT with dual heads (Transformer1d,
    `transformer.py:124-260`)."""
    vocab_size_txt: int
    vocab_size_img: int
    hparams: Stage2Hparams
    causal_attn: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        hp = self.hparams
        D = hp.embed_dim
        self.tok_emb_img = nn.Embed(self.vocab_size_img, D,
                                    name='tok_emb_img',
                                    embedding_init=_normal_init())
        self.tok_emb_txt = nn.Embed(self.vocab_size_txt, D,
                                    name='tok_emb_txt',
                                    embedding_init=_normal_init())
        self.pos_emb_img = nn.Embed(hp.ctx_len_img, D, name='pos_emb_img',
                                    embedding_init=_normal_init())
        self.pos_emb_txt = nn.Embed(hp.ctx_len_txt, D, name='pos_emb_txt',
                                    embedding_init=_normal_init())
        self.blocks = [
            Block(embed_dim=D, n_heads=hp.n_heads, mlp_bias=hp.mlp_bias,
                  attn_bias=hp.attn_bias, resid_pdrop=hp.resid_pdrop,
                  attn_pdrop=hp.attn_pdrop,
                  gelu_use_approx=hp.gelu_use_approx, dtype=self.dtype,
                  name=f'blocks_{i}') for i in range(hp.n_layers)]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, name='ln_f', dtype=self.dtype)
        self.head_img = nn.Dense(self.vocab_size_img, use_bias=False,
                                 name='head_img', dtype=self.dtype)
        self.head_txt = nn.Dense(self.vocab_size_txt, use_bias=False,
                                 name='head_txt', dtype=self.dtype)
        self.ctx_len_img = hp.ctx_len_img
        self.ctx_len_txt = hp.ctx_len_txt
        self.n_layers = hp.n_layers

    def __call__(self, images: jax.Array, texts: jax.Array,
                 deterministic: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
        """images: [B, T], texts: [B, N] -> (logits_img [B, T, Vi],
        logits_txt [B, N-1, Vt]) (`transformer.py:175-203`)."""
        B, T = images.shape
        _, N = texts.shape
        pos_t = jnp.tile(jnp.arange(N)[None], (B, 1))
        pos_i = jnp.tile(jnp.arange(T)[None], (B, 1))
        x = jnp.concatenate(
            [self.tok_emb_txt(texts) + self.pos_emb_txt(pos_t),
             self.tok_emb_img(images) + self.pos_emb_img(pos_i)], axis=1)
        mask = jnp.asarray(M.causal(N + T)) if self.causal_attn else None
        for blk in self.blocks:
            x = blk(x, mask=mask, deterministic=deterministic)
        x = self.ln_f(x)
        logits_txt = self.head_txt(x[:, :N - 1])
        logits_img = self.head_img(x[:, N - 1:-1])
        return logits_img, logits_txt

    def embed_texts(self, texts: jax.Array) -> jax.Array:
        B, N = texts.shape
        pos = jnp.tile(jnp.arange(N)[None], (B, 1))
        return self.tok_emb_txt(texts) + self.pos_emb_txt(pos)

    def embed_step(self, codes: jax.Array, pos: jax.Array) -> jax.Array:
        return (self.tok_emb_img(codes) + self.pos_emb_img(pos))[:, None, :]

    def decode_step(self, x: jax.Array, k_cache, v_cache, cache_len):
        for i, blk in enumerate(self.blocks):
            x, k_cache, v_cache = blk.step_stacked(x, k_cache, v_cache, i,
                                                   cache_len)
        logits = self.head_img(self.ln_f(x))[:, -1]
        return logits, k_cache, v_cache
