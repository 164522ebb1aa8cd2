"""HQ-Transformer for two-level modeling — the paper's main stage-2 model.

TPU re-design of `iHQGPT` (`hqvae/models/stage2/hierarchical_ar.py:23-887`):
a spatial GPT over fused top-cell embeddings plus a small depth transformer
head that emits the top code and its bot_win^2 child codes per spatial
position. The training forward is a single full-parallel pass; the sampling
path is decomposed into pure cached-step methods (`prefill`,
`spatial_step`, `depth_*`) that `sampling/engine.py` composes into one
jit-compiled `lax.scan` — replacing the reference's python loop with growing
`past` lists (`hqvae/utils/sampling.py:194-234`).

Faithfully replicated reference quirks (documented, not fixed):
* `use_random_order` creates `pred_emb_top` and applies it only in the
  sampling path — the training forward ignores the permutation
  (`hierarchical_ar.py:246-257` passes `order` but never uses it);
* the bidirectional depth sampler applies `top_k_bot`/`temperature[0]` to all
  positions including the top (`hierarchical_ar.py:861-874`);
* multi-group parallel depth sampling embeds previous bottom groups with
  `tok_emb_top_depth` (`hierarchical_ar.py:697-701`), mismatching training.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import linen as nn

from ...config import (ModelTypeSpec, Stage2Hparams, parse_embedding_type)
from ...ops import masks as M
from .layers import (Block, QuantizableDense, _merge_heads,
                     _split_heads, init_kv_cache,
                     masked_attention)


def _normal_init(std=0.02):
    return nn.initializers.normal(stddev=std)


def raster_to_cells(bot: jax.Array, h_top: int, win: int) -> jax.Array:
    """[B, (H win W win)] raster bottom codes -> [B, H*W, win*win] local
    groups (the rearrange at `hierarchical_ar.py:289-290`)."""
    return rearrange(bot, 'B (H h2 W w2) -> B (H W) (h2 w2)',
                     H=h_top, W=h_top, h2=win, w2=win)


def cells_to_raster(bot_cells: jax.Array, h_top: int, win: int) -> jax.Array:
    """Inverse of raster_to_cells: [B, H*W, win*win] -> [B, (H win W win)]."""
    return rearrange(bot_cells, 'B (H W) (h2 w2) -> B (H h2 W w2)',
                     H=h_top, W=h_top, h2=win, w2=win)


class HierarchicalGPT(nn.Module):
    """Two-level hierarchical AR transformer (iHQGPT,
    `hierarchical_ar.py:23-887`)."""
    vocab_size_top: int
    vocab_size_bot: int
    vocab_size_txt: int
    ratio_bot2top: int
    use_cls_cond: bool
    use_txt_cond: bool
    model_type: ModelTypeSpec
    hparams: Stage2Hparams
    hparams_dec: Optional[Stage2Hparams] = None
    dtype: jnp.dtype = jnp.float32
    cache_dtype: jnp.dtype = jnp.float32
    # gradient rematerialization for the TRAINING forward: recompute each
    # spatial block's activations in the backward pass instead of storing
    # them — trades ~1 extra forward of FLOPs for O(layers) less activation
    # HBM, the standard jax.checkpoint recipe for scaling batch on the
    # 1.38B L42 config. No reference analogue (torch would use
    # torch.utils.checkpoint); sampling paths are unaffected (no grads).
    remat: bool = False

    # ------------------------------------------------- derived configuration
    # properties (not setup state) so the sampling engine can read them from
    # the unbound module
    @property
    def hpd(self) -> Stage2Hparams:
        """Depth-transformer hparams; defaults to 4 layers of the main width
        (`hierarchical_ar.py:150-153`)."""
        if self.hparams_dec is not None:
            return self.hparams_dec
        return Stage2Hparams(**{**self.hparams.__dict__, 'n_layers': 4})

    @property
    def depth_mode(self) -> str:
        return self.model_type.depth_mode  # parallel | top2bot | bidirectional

    @property
    def bot_win(self) -> int:
        return self.model_type.bot_win if self.depth_mode != 'top2bot' else 1

    @property
    def num_bottom_pred(self) -> int:
        return self.bot_win * self.bot_win

    @property
    def len_seq_depth(self) -> int:
        return 1 + self.ratio_bot2top // self.num_bottom_pred

    @property
    def top_win(self) -> int:
        return int(math.isqrt(self.ratio_bot2top)) // self.bot_win

    @property
    def cell_win(self) -> int:
        return self.top_win * self.bot_win  # sqrt(ratio)

    @property
    def idx_pred(self) -> int:
        return self.hparams.ctx_len_txt if self.use_txt_cond else 0

    @property
    def spatial_embedding(self) -> str:
        return parse_embedding_type(self.hparams.embedding_type).kind

    @property
    def position_embedding(self) -> str:
        return self.hparams.position_embedding

    @property
    def use_random_order(self) -> bool:
        return bool(self.hparams.use_random_order)

    # ---------------------------------------------------------------- setup
    def setup(self):
        hp = self.hparams
        hpd = self.hpd
        D = hp.embed_dim
        emb = parse_embedding_type(hp.embedding_type)

        # conditioning (`hierarchical_ar.py:64-78`)
        if self.use_cls_cond:
            self.sos = nn.Embed(hp.n_classes, D, name='sos',
                                embedding_init=_normal_init())
        elif self.use_txt_cond:
            self.tok_emb_txt = nn.Embed(self.vocab_size_txt, D,
                                        name='tok_emb_txt',
                                        embedding_init=_normal_init())
            self.pos_emb_txt = nn.Embed(hp.ctx_len_txt, D,
                                        name='pos_emb_txt',
                                        embedding_init=_normal_init())
            self.head_txt = nn.Dense(self.vocab_size_txt, use_bias=False,
                                     name='head_txt', dtype=self.dtype)
            self.ln_txt = nn.LayerNorm(epsilon=1e-5, name='ln_txt',
                                       dtype=self.dtype)
        else:
            self.sos = self.param('sos', _normal_init(), (1, 1, D))

        # input embedding (`hierarchical_ar.py:81-116`)
        if emb.kind == 'reduce':
            self.tok_emb_top = nn.Embed(self.vocab_size_top, D,
                                        name='tok_emb_top',
                                        embedding_init=_normal_init())
            self.tok_emb_bot = nn.Embed(self.vocab_size_bot,
                                        D // self.ratio_bot2top,
                                        name='tok_emb_bot',
                                        embedding_init=_normal_init())
        elif emb.kind == 'multiple':
            self.tok_emb_top = nn.Embed(self.vocab_size_top, D,
                                        name='tok_emb_top',
                                        embedding_init=_normal_init())
            self.tok_emb_bot = nn.Embed(self.vocab_size_bot, D,
                                        name='tok_emb_bot',
                                        embedding_init=_normal_init())
            self.pos_emb_bot = self.param('pos_emb_bot', _normal_init(),
                                          (1, 1, D, self.num_bottom_pred))
        elif emb.kind in ('transformer', 'bidirectional'):
            self.tok_emb_top = nn.Embed(self.vocab_size_top, D,
                                        name='tok_emb_top',
                                        embedding_init=_normal_init())
            self.tok_emb_bot = nn.Embed(self.vocab_size_bot, D,
                                        name='tok_emb_bot',
                                        embedding_init=_normal_init())
            self.pos_emb_emb = nn.Embed(self.ratio_bot2top + 1, D,
                                        name='pos_emb_emb',
                                        embedding_init=_normal_init())
            self.emb_blocks = [
                Block(embed_dim=D, n_heads=hp.n_heads,
                      mlp_bias=hp.mlp_bias, attn_bias=hp.attn_bias,
                      resid_pdrop=hp.resid_pdrop, attn_pdrop=hp.attn_pdrop,
                      gelu_use_approx=hp.gelu_use_approx, dtype=self.dtype,
                      name=f'emb_blocks_{i}')
                for i in range(emb.n_layers_emb)]
        else:
            raise ValueError(emb.kind)

        # spatial position embedding (`hierarchical_ar.py:118-124`)
        if hp.position_embedding == '1d':
            self.pos_emb_top = nn.Embed(hp.ctx_len_img, D,
                                        name='pos_emb_top',
                                        embedding_init=_normal_init())
        elif hp.position_embedding == '2d':
            H = int(math.isqrt(hp.ctx_len_img))
            self.pos_emb_top_h = nn.Embed(H, D, name='pos_emb_top_h',
                                          embedding_init=_normal_init())
            self.pos_emb_top_w = nn.Embed(H, D, name='pos_emb_top_w',
                                          embedding_init=_normal_init())
        else:
            raise ValueError(hp.position_embedding)

        if self.use_random_order:
            self.pred_emb_top = nn.Embed(hp.ctx_len_img, D,
                                         name='pred_emb_top',
                                         embedding_init=_normal_init())

        # main transformer (`hierarchical_ar.py:134-144`); nn.remat keeps
        # the param tree identical, so checkpoints swap freely with the
        # non-remat module
        Blk = nn.remat(Block) if self.remat else Block
        self.blocks = [
            Blk(embed_dim=D, n_heads=hp.n_heads, mlp_bias=hp.mlp_bias,
                attn_bias=hp.attn_bias, resid_pdrop=hp.resid_pdrop,
                attn_pdrop=hp.attn_pdrop,
                gelu_use_approx=hp.gelu_use_approx, dtype=self.dtype,
                name=f'blocks_{i}') for i in range(hp.n_layers)]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, name='ln_f', dtype=self.dtype)

        # depth transformer (`hierarchical_ar.py:150-209`)
        Dd = hpd.embed_dim
        self.sos_depth = self.param('sos_depth', _normal_init(), (1, 1, Dd))
        self.tok_emb_top_depth = nn.Embed(self.vocab_size_top, Dd,
                                          name='tok_emb_top_depth',
                                          embedding_init=_normal_init())
        self.tok_emb_bot_depth = nn.Embed(self.vocab_size_bot, Dd,
                                          name='tok_emb_bot_depth',
                                          embedding_init=_normal_init())
        if self.depth_mode == 'parallel' and self.ratio_bot2top == 16:
            n_pos_depth = 16
        else:
            n_pos_depth = max(self.len_seq_depth, 5)
        self.pos_emb_depth = nn.Embed(n_pos_depth, Dd, name='pos_emb_depth',
                                      embedding_init=_normal_init())
        self.depths = [
            Blk(embed_dim=Dd, n_heads=hpd.n_heads, mlp_bias=hpd.mlp_bias,
                attn_bias=hpd.attn_bias, resid_pdrop=hpd.resid_pdrop,
                attn_pdrop=hpd.attn_pdrop,
                gelu_use_approx=hpd.gelu_use_approx, dtype=self.dtype,
                name=f'depths_{i}') for i in range(hpd.n_layers)]
        self.ln_top = nn.LayerNorm(epsilon=1e-5, name='ln_top', dtype=self.dtype)
        self.head_top = nn.Dense(self.vocab_size_top, use_bias=False,
                                 name='head_top', dtype=self.dtype)
        self.ln_bot = nn.LayerNorm(epsilon=1e-5, name='ln_bot', dtype=self.dtype)
        # QuantizableDense: head_bot is part of the depth-second chain
        # (the int8_stage2_scope hot path); identical params to nn.Dense
        self.head_bot = QuantizableDense(self.vocab_size_bot,
                                         use_bias=False, name='head_bot',
                                         dtype=self.dtype)


    # ------------------------------------------------------------ embedding
    def _spatial_pos_emb(self, positions: jax.Array) -> jax.Array:
        """positions: [B, L] int -> [B, L, D] (`hierarchical_ar.py:274-284,
        506-514`)."""
        if self.position_embedding == '1d':
            return self.pos_emb_top(positions)
        H = self.pos_emb_top_h.num_embeddings
        return self.pos_emb_top_h(positions // H) + \
            self.pos_emb_top_w(positions % H)

    def embed_cells(self, codes_t: jax.Array, bot_cells: jax.Array,
                    positions: jax.Array, deterministic: bool = True
                    ) -> jax.Array:
        """Fuse each top code with its local bottom codes into one spatial
        token. codes_t: [B, L], bot_cells: [B, L, ratio] (local raster
        order), positions: [B, L]. Returns [B, L, D].

        Covers the reference's 'reduce' / 'multiple' / 'transformer' /
        'bidirectional' spatial-embedding modes
        (`hierarchical_ar.py:286-317`).
        """
        B, L = codes_t.shape
        pos_emb = self._spatial_pos_emb(positions)
        kind = self.spatial_embedding
        if kind == 'reduce':
            h_top = self.tok_emb_top(codes_t) + pos_emb
            h_bot = self.tok_emb_bot(bot_cells)            # [B, L, r, D/r]
            # channel pack K-major: (K H2 W2) (`hierarchical_ar.py:289-291`)
            h_bot = rearrange(h_bot, 'B L r k -> B L (k r)')
            return h_top + h_bot
        if kind == 'multiple':
            h_top = self.tok_emb_top(codes_t) + pos_emb
            h_bot = self.tok_emb_bot(bot_cells)            # [B, L, r, D]
            h_bot = rearrange(h_bot, 'B L r k -> B L k r')
            return h_top + (h_bot * self.pos_emb_bot).sum(-1)
        # transformer / bidirectional (`hierarchical_ar.py:299-315`)
        emb_top = self.tok_emb_top(codes_t)
        if kind == 'transformer':
            emb_top = emb_top + pos_emb
        emb_bot = self.tok_emb_bot(bot_cells)              # [B, L, r, D]
        h = jnp.concatenate([emb_top[:, :, None, :], emb_bot], axis=2)
        h = h + self.pos_emb_emb(jnp.arange(self.ratio_bot2top + 1))
        h = h.reshape(B * L, self.ratio_bot2top + 1, -1)
        for blk in self.emb_blocks:
            h = blk(h, mask=None, deterministic=deterministic)
        h = h.mean(axis=1).reshape(B, L, -1)
        if kind == 'bidirectional':
            h = h + pos_emb
        return h

    def _sos_embedding(self, B: int, labels: Optional[jax.Array]
                       ) -> jax.Array:
        """[B, S, D] conditioning prefix (`hierarchical_ar.py:319-327`)."""
        if self.use_cls_cond:
            return self.sos(labels)[:, None, :]
        if self.use_txt_cond:
            pos = jnp.arange(self.idx_pred)[None, :]
            return self.tok_emb_txt(labels) + self.pos_emb_txt(pos)
        return jnp.tile(self.sos, (B, 1, 1))

    # -------------------------------------------------------------- forward
    def __call__(self, codes_t: jax.Array, codes_b: jax.Array,
                 labels: Optional[jax.Array] = None,
                 deterministic: bool = True):
        """Training forward. codes_t: [B, Ttop], codes_b: [B, Ttop*ratio]
        raster order. Returns (logits_top [B, Ttop, Vt],
        logits_bot [B, Tbot, Vb][, logits_txt]).
        (`hierarchical_ar.py:246-426`)."""
        if self.is_initializing():
            # materialize params the training forward doesn't touch so
            # checkpoints cover them (torch creates them unconditionally):
            # tok_emb_bot_depth in parallel/bidirectional modes
            # (`hierarchical_ar.py:162-165`), pred_emb_top (sampler-only)
            _ = self.tok_emb_bot_depth(jnp.zeros((1,), jnp.int32))
            if self.use_random_order:
                _ = self.pred_emb_top(jnp.zeros((1,), jnp.int32))
        h = self.forward_main(codes_t, codes_b, labels, deterministic)
        return self.forward_depth(h, codes_t, codes_b, deterministic)

    def forward_main(self, codes_t, codes_b, labels=None,
                     deterministic: bool = True):
        B, Ttop = codes_t.shape
        h_top = int(math.isqrt(Ttop))
        bot_cells = raster_to_cells(codes_b, h_top, self.cell_win)
        positions = jnp.tile(jnp.arange(Ttop)[None, :], (B, 1))
        h = self.embed_cells(codes_t, bot_cells, positions, deterministic)
        sos = self._sos_embedding(B, labels)
        h = jnp.concatenate([sos, h[:, :-1]], axis=1)
        mask = jnp.asarray(M.causal(h.shape[1]))
        for blk in self.blocks:
            h = blk(h, mask=mask, deterministic=deterministic)
        return self.ln_f(h)

    def forward_depth(self, h, codes_t, codes_b, deterministic: bool = True):
        B, Ttop = codes_t.shape
        h_top = int(math.isqrt(Ttop))
        r = self.ratio_bot2top

        logits_txt = None
        if self.use_txt_cond:
            h_txt = h[:, :self.idx_pred - 1, :]
            logits_txt = self.head_txt(self.ln_txt(h_txt))
            h = h[:, self.idx_pred - 1:, :]

        hs = h.reshape(B * Ttop, 1, -1) + self.sos_depth
        emb_top = self.tok_emb_top_depth(codes_t).reshape(B * Ttop, 1, -1)

        if self.depth_mode == 'parallel':
            # input [sos+h, Top+Pos0..r-1] (`hierarchical_ar.py:380-403`)
            pos = self.pos_emb_depth(jnp.arange(r))[None]
            x = jnp.concatenate([hs, emb_top + pos], axis=1)
            mask = jnp.asarray(M.parallel_2level(1 + r, self.num_bottom_pred))
        elif self.depth_mode == 'bidirectional':
            # input [sos+h, Pos0..r-1], full attention
            # (`hierarchical_ar.py:405-421`)
            pos = self.pos_emb_depth(jnp.arange(r))[None]
            x = jnp.concatenate([hs, jnp.tile(pos, (B * Ttop, 1, 1))], axis=1)
            mask = None
        elif self.depth_mode == 'top2bot':
            # causal [sos+h, Top, Bot0..len-3] (`hierarchical_ar.py:353-378`)
            bot_cells = raster_to_cells(codes_b, h_top, self.cell_win)
            emb_bot = self.tok_emb_bot_depth(bot_cells).reshape(
                B * Ttop, r, -1)
            pos_top = self.pos_emb_depth(jnp.arange(1))[None]
            pos_bot = self.pos_emb_depth(
                jnp.arange(1, self.len_seq_depth))[None]
            emb_bot = emb_bot + pos_bot
            x = jnp.concatenate(
                [hs, emb_top + pos_top,
                 emb_bot[:, 0:self.len_seq_depth - 2, :]], axis=1)
            mask = jnp.asarray(M.causal(x.shape[1]))
        else:
            raise ValueError(self.depth_mode)

        for blk in self.depths:
            x = blk(x, mask=mask, deterministic=deterministic)

        logits_top = self.head_top(self.ln_top(x[:, 0, :]))
        logits_bot = self.head_bot(self.ln_bot(x[:, 1:, :]))
        logits_top = logits_top.reshape(B, Ttop, -1)
        logits_bot = rearrange(
            logits_bot, '(B H W) (h2 w2) K -> B (H h2 W w2) K',
            B=B, H=h_top, W=h_top, h2=self.cell_win, w2=self.cell_win)
        if self.use_txt_cond:
            return logits_top, logits_bot, logits_txt
        return logits_top, logits_bot

    # --------------------------------------------------------- decode steps
    def sos_tokens(self, B: int, labels: Optional[jax.Array]) -> jax.Array:
        """Public wrapper used by the sampler to build the prefix."""
        return self._sos_embedding(B, labels)

    def spatial_step(self, x: jax.Array, k_cache, v_cache, cache_len,
                     t_compute: int = 0):
        """Run the spatial transformer on T_new token(s) against the cache.
        x: [B, T_new, D]; caches: [L, B, nh, T_max, hd]. Returns (h after
        ln_f [B, T_new, D], k_cache', v_cache')
        (`hierarchical_ar.py:482-563`). `t_compute` (static) bounds the
        packed kernel's per-segment compute; see
        ops/pallas_attention.decode_attention_step."""
        for i, blk in enumerate(self.blocks):
            x, k_cache, v_cache = blk.step_stacked(x, k_cache, v_cache, i,
                                                   cache_len,
                                                   t_compute=t_compute)
        return self.ln_f(x), k_cache, v_cache

    def embed_cell_step(self, code_t: jax.Array, bot_cell: jax.Array,
                        position: jax.Array) -> jax.Array:
        """Embed ONE previously-generated cell for the next spatial step.
        code_t: [B], bot_cell: [B, ratio], position: [B] int. -> [B, 1, D].
        (`hierarchical_ar.py:506-551`)."""
        x = self.embed_cells(code_t[:, None], bot_cell[:, None, :],
                             position[:, None])
        if self.use_random_order:
            # sampler-only pred_emb (reference quirk, see module docstring)
            x = x + self.pred_emb_top(position[:, None] + 1)
        return x

    def depth_first_logits(self, h: jax.Array):
        """Depth iteration 0: logits over the top vocabulary from sos+h.
        h: [B, D]. Returns (logits_top [B, Vt], per-layer (k1, v1) lists of
        the single depth token) (`hierarchical_ar.py:682-695`)."""
        x = h[:, None, :] + self.sos_depth
        ks, vs = [], []
        for blk in self.depths:
            xn = blk.ln1(x)
            # single-token attention: softmax over one key is identically 1,
            # so the attention output IS v — skip q and the softmax entirely.
            # k and v in one fused gemm ([C, 2C] weight concat is
            # loop-invariant, hoisted out of the scan).
            a = blk.attn
            w_kv = jnp.concatenate([a.key.variables['params']['kernel'],
                                    a.value.variables['params']['kernel']],
                                   axis=1)
            kv = jnp.dot(xn, w_kv.astype(xn.dtype))
            if a.attn_bias:
                b_kv = jnp.concatenate([a.key.variables['params']['bias'],
                                        a.value.variables['params']['bias']])
                kv = kv + b_kv.astype(xn.dtype)
            k, v = jnp.split(kv, 2, axis=-1)
            k = _split_heads(k, a.n_heads)
            v = _split_heads(v, a.n_heads)
            x = x + a.proj(_merge_heads(v))
            x = x + blk._mlp(blk.ln2(x), True)
            ks.append(k)
            vs.append(v)
        logits_top = self.head_top(self.ln_top(x[:, 0, :]))
        return logits_top, (ks, vs)

    def depth_second_logits(self, codes: jax.Array, depth_kv,
                            group: int = 1):
        """Depth iteration `group` (parallel mode): bottom-group logits given
        the previous codes ([B, 1] sampled top for group 1; [B, n] previous
        bottom group after — embedded with tok_emb_top_depth either way, a
        reference quirk) and the cached depth tokens. Returns
        (logits_bot [B, num_bottom_pred, Vb], updated kv)
        (`hierarchical_ar.py:696-718`)."""
        ks, vs = depth_kv
        n = self.num_bottom_pred
        pos_idx = jnp.arange(n * (group - 1), n * group)
        x = self.tok_emb_top_depth(codes) + self.pos_emb_depth(pos_idx)[None]

        # Full attention over [past; new] (`layers.py:147-152`). The
        # sequences are tiny (Tq = n, Tk = n*group + 1), so per-head einsums
        # lower to thousands of tile-padded micro-matmuls; instead compute
        # per-head scores via one elementwise product + a head-mask matmul
        # on the MXU (exact same math — see ops/pallas_attention.py):
        #   s[b,q,t,h] = sum_d (q[b,q,:] * k[b,t,:])[d] . par[d,h]
        nh = self.hpd.n_heads
        D = self.hpd.embed_dim
        hd = D // nh
        par = ((jnp.arange(D) // hd)[:, None] ==
               jnp.arange(nh)[None, :])
        scale = 1.0 / np.sqrt(hd)

        def flat_heads(t):  # [B, nh, T, hd] -> [B, T, D]
            return _merge_heads(t)

        new_ks, new_vs = [], []
        for i, blk in enumerate(self.depths):
            xn = blk.ln1(x)
            q, k_new, v_new = jnp.split(blk.attn._fused_qkv_flat(xn), 3,
                                        axis=-1)                 # [B, Tq, D]
            k_flat = jnp.concatenate([flat_heads(ks[i]), k_new], axis=1)
            v_flat = jnp.concatenate([flat_heads(vs[i]), v_new], axis=1)
            P = q[:, :, None, :] * k_flat[:, None, :, :]   # [B, Tq, Tk, D]
            s = jnp.einsum('bqtd,dh->bqth', P, par.astype(P.dtype),
                           preferred_element_type=jnp.float32) * scale
            att = jax.nn.softmax(s, axis=2)                # [B, Tq, Tk, nh]
            A = jnp.einsum('bqth,dh->bqtd', att.astype(x.dtype),
                           par.astype(x.dtype))
            y = jnp.sum(A * v_flat[:, None, :, :], axis=2)   # [B, Tq, D]
            x = x + blk.attn.proj(y)
            x = x + blk._mlp(blk.ln2(x), True)
            new_ks.append(_split_heads(k_flat, nh))
            new_vs.append(_split_heads(v_flat, nh))
        logits_bot = self.head_bot(self.ln_bot(x))
        return logits_bot, (new_ks, new_vs)

    def depth_bidirectional(self, h: jax.Array):
        """Single-pass bidirectional depth decode: input [sos+h, Pos0..r-1],
        full attention; logits for all 1+r positions
        (`hierarchical_ar.py:806-826`). h: [B, D]."""
        x0 = h[:, None, :] + self.sos_depth
        B = x0.shape[0]
        pos = self.pos_emb_depth(jnp.arange(self.ratio_bot2top))[None]
        x = jnp.concatenate([x0, jnp.tile(pos, (B, 1, 1))], axis=1)
        for blk in self.depths:
            x = blk(x, mask=None)
        logits_top = self.head_top(self.ln_top(x[:, 0:1, :]))
        logits_bot = self.head_bot(self.ln_bot(x[:, 1:, :]))
        return logits_top, logits_bot

    def depth_causal_step(self, x: jax.Array, k_cache, v_cache, cache_len):
        """One causal depth step for top2bot mode. x: [B, 1, Dd]; caches
        [Ld, B, nh, len_seq_depth, hd] (`hierarchical_ar.py:565-611`)."""
        new_k, new_v = [], []
        for i, blk in enumerate(self.depths):
            x, k_i, v_i = blk.step(x, k_cache[i], v_cache[i], cache_len)
            new_k.append(k_i)
            new_v.append(v_i)
        return x, jnp.stack(new_k), jnp.stack(new_v)
