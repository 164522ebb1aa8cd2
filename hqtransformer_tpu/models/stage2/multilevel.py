"""HQ-Transformer for 3+ level modeling ('multilevel-hq').

TPU re-design of `HQTransformer` (`hqvae/models/stage2/hqtransformer.py:22-814`):
the spatial GPT runs over cells that fuse one top code with its 4 mid and 16
bottom children (code_len = 21), and the depth head decodes the 21 local
codes either hierarchically in 3 parallel phases (1 top -> 4 mid -> 16 bot,
'parallel[-add|-reduce]'/'tree') or fully causally ('top2mid2bot').

The phase decode recomputes the short depth sequence (<= 21 tokens, 4 layers)
instead of maintaining KV caches — on TPU the recompute is cheaper than the
dynamic-slice bookkeeping and keeps every matmul dense and static.

Depth-sequence bottom ordering is the reference's pyramid order
(h1, h2, w1, w2) — see the rearranges at `hqtransformer.py:363-378,396-402`.

Reference bug fixed here (documented divergence): the reference's training
forward appends the level-2 depth inputs only under the 'add' decoding type
(`hqtransformer.py:383-386`), so plain 'parallel' crashes and 'tree' hits an
assert; this implementation appends them for every hierarchy decoding type.
Checkpoint parity is unaffected ('parallel-add'/'top2mid2bot' are the only
shipped variants).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from ...config import Stage2Hparams, parse_embedding_type
from ...ops import masks as M
from .layers import Block, QuantizableDense


def _normal_init(std=0.02):
    return nn.initializers.normal(stddev=std)


def level_cells(code: jax.Array, h_top: int, win: int) -> jax.Array:
    """Raster [B, (H win W win)] -> per-top-cell groups [B, H*W, win*win]
    (local raster order h2*win+w2), `hqtransformer.py:271-277`."""
    return rearrange(code, 'B (H h2 W w2) -> B (H W) (h2 w2)',
                     H=h_top, W=h_top, h2=win, w2=win)


def cells_to_level(cells: jax.Array, h_top: int, win: int) -> jax.Array:
    return rearrange(cells, 'B (H W) (h2 w2) -> B (H h2 W w2)',
                     H=h_top, W=h_top, h2=win, w2=win)


# NOTE: the reference's "pyramid" flatten order (h1, h2, w1, w2)
# (`hqtransformer.py:377,396-402`) is identical to the local raster order of
# a 4x4 cell (row 2*h1+h2, col 2*w1+w2 -> index 8*h1+4*h2+2*w1+w2), so
# level_cells/cells_to_level cover both layouts.


class MultiLevelHQTransformer(nn.Module):
    """3-level hierarchical AR transformer (`hqtransformer.py:22-814`)."""
    vocab_sizes: Sequence[int]
    vocab_size_txt: int
    decoding_type: str
    use_cls_cond: bool
    use_txt_cond: bool
    hparams: Stage2Hparams
    hparams_dec: Optional[Stage2Hparams] = None
    dtype: jnp.dtype = jnp.float32

    # ------------------------------------------------- derived configuration
    @property
    def code_level(self) -> int:
        return len(self.vocab_sizes)

    @property
    def code_len(self) -> int:
        n = 1
        for li in range(1, self.code_level):
            n += (2 ** li) ** 2
        return n

    @property
    def hpd(self) -> Stage2Hparams:
        if self.hparams_dec is not None:
            return self.hparams_dec
        return Stage2Hparams(**{**self.hparams.__dict__, 'n_layers': 4})

    @property
    def parallel_type(self) -> str:
        return self.decoding_type.split('-')[0]  # 'parallel' | 'tree'

    @property
    def idx_pred(self) -> int:
        return self.hparams.ctx_len_txt if self.use_txt_cond else 0

    @property
    def spatial_embedding(self) -> str:
        return parse_embedding_type(self.hparams.embedding_type).kind

    @property
    def is_causal_depth(self) -> bool:
        return 'top2mid2bot' in self.decoding_type

    # ---------------------------------------------------------------- setup
    def setup(self):
        hp = self.hparams
        hpd = self.hpd
        D, Dd = hp.embed_dim, hpd.embed_dim
        assert self.code_level == 3, 'reference supports 3 levels here too'

        # --- embedding (`hqtransformer.py:24-56`)
        emb = parse_embedding_type(hp.embedding_type)
        if emb.kind == 'reduce':
            dims = [int(D // (4 ** i)) for i in range(self.code_level)]
            self.tok_emb_levels = [
                nn.Embed(v, dims[i], name=f'tok_emb_levels_{i}',
                         embedding_init=_normal_init())
                for i, v in enumerate(self.vocab_sizes)]
        elif emb.kind == 'transformer':
            self.tok_emb_levels = [
                nn.Embed(v, D, name=f'tok_emb_levels_{i}',
                         embedding_init=_normal_init())
                for i, v in enumerate(self.vocab_sizes)]
            self.pos_emb_emb = nn.Embed(self.code_len, D, name='pos_emb_emb',
                                        embedding_init=_normal_init())
            self.emb_blocks = [
                Block(embed_dim=D, n_heads=hp.n_heads, mlp_bias=hp.mlp_bias,
                      attn_bias=hp.attn_bias, resid_pdrop=hp.resid_pdrop,
                      attn_pdrop=hp.attn_pdrop,
                      gelu_use_approx=hp.gelu_use_approx, dtype=self.dtype,
                      name=f'emb_blocks_{i}')
                for i in range(emb.n_layers_emb)]
        else:
            raise ValueError(emb.kind)

        # --- body (`hqtransformer.py:58-99`)
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

        self.blocks = [
            Block(embed_dim=D, n_heads=hp.n_heads, mlp_bias=hp.mlp_bias,
                  attn_bias=hp.attn_bias, resid_pdrop=hp.resid_pdrop,
                  attn_pdrop=hp.attn_pdrop,
                  gelu_use_approx=hp.gelu_use_approx, dtype=self.dtype,
                  name=f'blocks_{i}') for i in range(hp.n_layers)]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, name='ln_f', dtype=self.dtype)

        # --- depth head (`hqtransformer.py:101-166`)
        self.sos_depth = self.param('sos_depth', _normal_init(), (1, 1, Dd))
        tok_depth = []
        for li, v in enumerate(self.vocab_sizes):
            if 'reduce' in self.decoding_type:
                chn_mult = 16 if li == 2 else 4
                tok_depth.append(nn.Embed(v, chn_mult * hp.embed_dim,
                                          name=f'tok_emb_depth_levels_{li}',
                                          embedding_init=_normal_init()))
            else:
                tok_depth.append(nn.Embed(v, hp.embed_dim,
                                          name=f'tok_emb_depth_levels_{li}',
                                          embedding_init=_normal_init()))
        self.tok_emb_depth_levels = tok_depth

        if 'tree' in self.decoding_type or self.decoding_type == 'old-parallel':
            self.pos_emb_depths = [
                nn.Embed(4, Dd, name=f'pos_emb_depths_{i}',
                         embedding_init=_normal_init())
                for i in range(self.code_level)]
        elif 'parallel' in self.decoding_type:
            self.pos_emb_depths = [
                nn.Embed(4, Dd, name='pos_emb_depths_0',
                         embedding_init=_normal_init()),
                nn.Embed(16, Dd, name='pos_emb_depths_1',
                         embedding_init=_normal_init())]
        elif 'top2mid2bot' in self.decoding_type:
            self.pos_emb_depths = [
                nn.Embed(self.code_len, Dd, name='pos_emb_depths_0',
                         embedding_init=_normal_init())]
        else:
            raise ValueError(self.decoding_type)

        self.depths = [
            Block(embed_dim=Dd, n_heads=hpd.n_heads, mlp_bias=hpd.mlp_bias,
                  attn_bias=hpd.attn_bias, resid_pdrop=hpd.resid_pdrop,
                  attn_pdrop=hpd.attn_pdrop,
                  gelu_use_approx=hpd.gelu_use_approx, dtype=self.dtype,
                  name=f'depths_{i}') for i in range(hpd.n_layers)]
        self.ln_levels = [nn.LayerNorm(epsilon=1e-5, name=f'ln_levels_{i}',
                                       dtype=self.dtype)
                          for i in range(self.code_level)]
        # QuantizableDense (identical params to nn.Dense): the per-level
        # heads are part of the depth-phase chain, the int8_stage2_scope
        # hot path of serving=int8max (mirrors the 2-level head_bot)
        self.head_levels = [QuantizableDense(v, use_bias=False,
                                             name=f'head_levels_{i}',
                                             dtype=self.dtype)
                            for i, v in enumerate(self.vocab_sizes)]

    # ------------------------------------------------------------ embedding
    def _spatial_pos_emb(self, positions: jax.Array) -> jax.Array:
        if self.hparams.position_embedding == '1d':
            return self.pos_emb_top(positions)
        H = self.pos_emb_top_h.num_embeddings
        return self.pos_emb_top_h(positions // H) + \
            self.pos_emb_top_w(positions % H)

    def embed_cells(self, level_cells_list: List[jax.Array],
                    positions: jax.Array, deterministic: bool = True
                    ) -> jax.Array:
        """Fuse one top code + 4 mid + 16 bottom cells into one spatial token
        (`hqtransformer.py:265-285`). level_cells_list[li]: [B, L, 4**li]
        (local raster order). Returns [B, L, D]."""
        B, L = level_cells_list[0].shape[:2]
        pos_emb = self._spatial_pos_emb(positions)
        hs = []
        e0 = self.tok_emb_levels[0](level_cells_list[0].reshape(B, L))
        hs.append((e0 + pos_emb)[:, :, None, :])
        for li in range(1, self.code_level):
            hs.append(self.tok_emb_levels[li](level_cells_list[li]))
        h = jnp.concatenate(hs, axis=2)  # [B, L, 21, D]
        h = h + self.pos_emb_emb(jnp.arange(self.code_len))
        h = h.reshape(B * L, self.code_len, -1)
        for blk in self.emb_blocks:
            h = blk(h, mask=None, deterministic=deterministic)
        return h.mean(axis=1).reshape(B, L, -1)

    def _sos_embedding(self, B: int, labels: Optional[jax.Array]):
        if self.use_cls_cond:
            return self.sos(labels)[:, None, :]
        if self.use_txt_cond:
            pos = jnp.arange(self.idx_pred)[None, :]
            return self.tok_emb_txt(labels) + self.pos_emb_txt(pos)
        return jnp.tile(self.sos, (B, 1, 1))

    def sos_tokens(self, B: int, labels: Optional[jax.Array]):
        return self._sos_embedding(B, labels)

    # -------------------------------------------------------------- forward
    def __call__(self, codes: List[jax.Array],
                 labels: Optional[jax.Array] = None,
                 deterministic: bool = True):
        """codes: per-level raster code maps [B, (H_l W_l)] (top, mid, bot).
        Returns list of per-level logits (+ txt logits when txt-cond)
        (`hqtransformer.py:226-238`)."""
        if self.is_initializing():
            # materialize depth embeddings the hierarchy forward never calls
            # (torch creates them unconditionally, `hqtransformer.py:107-117`)
            for emb in self.tok_emb_depth_levels:
                _ = emb(jnp.zeros((1,), jnp.int32))
            for pos in self.pos_emb_depths:
                _ = pos(jnp.zeros((1,), jnp.int32))
        h = self.forward_embeddings(codes, labels, deterministic)
        if self.is_causal_depth:
            return self.forward_causal(h, codes, deterministic)
        return self.forward_hierarchy(h, codes, deterministic)

    def forward_embeddings(self, codes, labels=None, deterministic=True):
        B, Ttop = codes[0].shape
        h_top = int(math.isqrt(Ttop))
        cells = [codes[0][:, :, None]]
        for li in range(1, self.code_level):
            cells.append(level_cells(codes[li], h_top, 2 ** li))
        positions = jnp.tile(jnp.arange(Ttop)[None, :], (B, 1))
        h = self.embed_cells(cells, positions, deterministic)
        sos = self._sos_embedding(B, labels)
        h = jnp.concatenate([sos, h[:, :-1]], axis=1)
        mask = jnp.asarray(M.causal(h.shape[1]))
        for blk in self.blocks:
            h = blk(h, mask=mask, deterministic=deterministic)
        return self.ln_f(h)

    def _depth_inputs_hierarchy(self, h_flat, codes, B, Ttop, h_top):
        """Build the 21-token depth input [sos+h, mid-inputs, bot-inputs]
        (`hqtransformer.py:306-388`). h_flat: [(B Ttop), 1, D]."""
        hs = [h_flat + self.sos_depth]

        pos_level0 = self.pos_emb_depths[0](jnp.arange(4))[None]
        top_embed = self.tok_emb_depth_levels[0](codes[0])  # [B, Ttop, *]
        if 'reduce' in self.decoding_type:
            top_embed = top_embed.reshape(B * Ttop, 4, -1)
        else:
            top_embed = top_embed.reshape(B * Ttop, 1, -1)
        emb_level0 = top_embed + pos_level0  # [(B Ttop), 4, D]
        hs.append(emb_level0)

        emb1 = self.tok_emb_depth_levels[1](codes[1])  # [B, (H 2 W 2), *]
        pos_level1 = self.pos_emb_depths[1](jnp.arange(16))[None]
        pos_level1 = rearrange(pos_level1, 'x (h1 h2 w1 w2) k -> '
                               'x (h1 w1) (h2 w2) k', h1=2, h2=2, w1=2, w2=2)
        if 'reduce' in self.decoding_type:
            emb1 = rearrange(emb1, 'B (H h1 W w1) (k1 K) -> '
                             '(B H W) (h1 w1) k1 K',
                             H=h_top, W=h_top, h1=2, w1=2, k1=4)
        else:
            emb1 = rearrange(emb1, 'B (H h1 W w1) K -> (B H W) (h1 w1) 1 K',
                             H=h_top, W=h_top, h1=2, w1=2)
        emb1 = emb1 + pos_level1  # [(B Ttop), 4, 4, D]
        emb1 = rearrange(emb1, 'bhw (h1 w1) (h2 w2) K -> '
                         'bhw (h1 h2 w1 w2) K', h1=2, w1=2, h2=2, w2=2)
        if 'add' in self.decoding_type:
            emb1 = emb1 + top_embed
        hs.append(emb1)
        return jnp.concatenate(hs, axis=1)  # [(B Ttop), 21, D]

    def forward_hierarchy(self, h, codes, deterministic=True):
        B, Ttop = codes[0].shape
        h_top = int(math.isqrt(Ttop))

        logits_txt = None
        if self.use_txt_cond:
            h_txt = h[:, :self.idx_pred - 1, :]
            logits_txt = self.head_txt(self.ln_txt(h_txt))
            h = h[:, self.idx_pred - 1:, :]

        h_flat = h.reshape(B * Ttop, 1, -1)
        x = self._depth_inputs_hierarchy(h_flat, codes, B, Ttop, h_top)
        mask = jnp.asarray(M.level3(self.parallel_type))
        for blk in self.depths:
            x = blk(x, mask=mask, deterministic=deterministic)

        l0 = self.head_levels[0](self.ln_levels[0](x[:, 0, :]))
        l1 = self.head_levels[1](self.ln_levels[1](x[:, 1:5, :]))
        l2 = self.head_levels[2](self.ln_levels[2](x[:, 5:21, :]))
        logits = [
            l0.reshape(B, Ttop, -1),
            rearrange(l1, '(B H W) (h1 w1) K -> B (H h1 W w1) K',
                      B=B, H=h_top, W=h_top, h1=2, w1=2),
            rearrange(l2, '(B H W) (h1 h2 w1 w2) K -> B (H h1 h2 W w1 w2) K',
                      B=B, H=h_top, W=h_top, h1=2, h2=2, w1=2, w2=2)]
        if self.use_txt_cond:
            logits.append(logits_txt)
        return logits

    def forward_causal(self, h, codes, deterministic=True):
        """'top2mid2bot' fully causal depth (`hqtransformer.py:637-701`)."""
        B, Ttop = codes[0].shape
        h_top = int(math.isqrt(Ttop))

        logits_txt = None
        if self.use_txt_cond:
            h_txt = h[:, :self.idx_pred - 1, :]
            logits_txt = self.head_txt(self.ln_txt(h_txt))
            h = h[:, self.idx_pred - 1:, :]

        e0 = self.tok_emb_depth_levels[0](codes[0])
        e1 = self.tok_emb_depth_levels[1](codes[1])
        e2 = self.tok_emb_depth_levels[2](codes[2])
        e0 = rearrange(e0, 'B (H W) K -> (B H W) 1 K', H=h_top, W=h_top)
        # faithful reference quirk (`hqtransformer.py:669`): the mid raster
        # is factorized as (H 2 2 W) — cell (h, w) receives mid inputs from
        # rows {2h, 2h+1} and columns {w, w+h_top}, NOT its raster children,
        # in (h1, h2) token order — while the mid LOGITS positions map to the
        # true raster children. Checkpoint parity requires this exact layout.
        e1 = rearrange(e1, 'B (H h1 h2 W) K -> (B H W) (h1 h2) K',
                       H=h_top, W=h_top, h1=2, h2=2)
        e2 = rearrange(e2, 'B (H h1 h2 W w1 w2) K -> '
                       '(B H W) (h1 h2 w1 w2) K',
                       H=h_top, W=h_top, h1=2, h2=2, w1=2, w2=2)
        if 'add' in self.decoding_type:
            # the reference broadcast crashes here ((.,4,4,K)+(.,2,2,K),
            # `hqtransformer.py:672-674`) — top2mid2bot-add is unsupported
            raise ValueError("decoding_type 'top2mid2bot' does not support "
                             "'-add' (broken in the reference as well)")

        h_flat = h.reshape(B * Ttop, 1, -1)
        x = jnp.concatenate([h_flat, e0, e1, e2[:, :-1, :]], axis=1)
        pos = self.pos_emb_depths[0](jnp.arange(self.code_len - 1))[None]
        x = x + jnp.concatenate(
            [jnp.tile(self.sos_depth, (B * Ttop, 1, 1)),
             jnp.tile(pos, (B * Ttop, 1, 1))], axis=1)
        mask = jnp.asarray(M.causal(self.code_len))
        for blk in self.depths:
            x = blk(x, mask=mask, deterministic=deterministic)

        l0 = self.head_levels[0](self.ln_levels[0](x[:, 0, :]))
        l1 = self.head_levels[1](self.ln_levels[1](x[:, 1:5, :]))
        l2 = self.head_levels[2](self.ln_levels[2](x[:, 5:21, :]))
        logits = [
            l0.reshape(B, Ttop, -1),
            rearrange(l1, '(B H W) (h1 w1) K -> B (H h1 W w1) K',
                      B=B, H=h_top, W=h_top, h1=2, w1=2),
            rearrange(l2, '(B H W) (h1 h2 w1 w2) K -> B (H h1 h2 W w1 w2) K',
                      B=B, H=h_top, W=h_top, h1=2, h2=2, w1=2, w2=2)]
        if self.use_txt_cond:
            logits.append(logits_txt)
        return logits

    # --------------------------------------------------------- decode steps
    def spatial_step(self, x: jax.Array, k_cache, v_cache, cache_len,
                     t_compute: int = 0):
        """Cached spatial step (same contract as HierarchicalGPT;
        `t_compute` bounds the packed kernel's per-segment compute)."""
        for i, blk in enumerate(self.blocks):
            x, k_cache, v_cache = blk.step_stacked(x, k_cache, v_cache, i,
                                                   cache_len,
                                                   t_compute=t_compute)
        return self.ln_f(x), k_cache, v_cache

    def embed_cell_step(self, top: jax.Array, mid: jax.Array,
                        bot: jax.Array, position: jax.Array) -> jax.Array:
        """Embed one generated cell: top [B], mid [B, 4] (local raster),
        bot [B, 16] (local raster); -> [B, 1, D]."""
        cells = [top[:, None, None], mid[:, None, :], bot[:, None, :]]
        return self.embed_cells(cells, position[:, None])

    def _phase_inputs(self, h: Optional[jax.Array], top: Optional[jax.Array],
                      mid_local: Optional[jax.Array], phase: int
                      ) -> jax.Array:
        """NEW depth tokens entering at `phase` (the phase-`phase` slice of
        the 21-token input, `hqtransformer.py:306-388`): 0 -> [B, 1, D]
        (sos+h), 1 -> [B, 4, D] (top inputs), 2 -> [B, 16, D] (mid
        inputs)."""
        if phase == 0:
            return h[:, None, :] + self.sos_depth
        B = top.shape[0]
        if phase == 1:
            pos0 = self.pos_emb_depths[0](jnp.arange(4))[None]
            e_top = self.tok_emb_depth_levels[0](top)
            if 'reduce' in self.decoding_type:
                e_top = e_top.reshape(B, 4, -1)
            else:
                e_top = e_top[:, None, :]
            return e_top + pos0
        e1 = self.tok_emb_depth_levels[1](mid_local)  # [B, 4, *]
        pos1 = self.pos_emb_depths[1](jnp.arange(16))[None]
        pos1 = rearrange(pos1, 'x (h1 h2 w1 w2) k -> x (h1 w1) (h2 w2) k',
                         h1=2, h2=2, w1=2, w2=2)
        if 'reduce' in self.decoding_type:
            e1 = rearrange(e1, 'B g (k1 K) -> B g k1 K', k1=4)
        else:
            e1 = e1[:, :, None, :]
        e1 = e1 + pos1
        e1 = rearrange(e1, 'B (h1 w1) (h2 w2) K -> B (h1 h2 w1 w2) K',
                       h1=2, w1=2, h2=2, w2=2)
        if 'add' in self.decoding_type:
            # (`hqtransformer.py:545-547`; reduce+add dims mismatch in
            # the reference too)
            e1 = e1 + self.tok_emb_depth_levels[0](top)[:, None, :]
        return e1

    def _phase_head(self, x: jax.Array, phase: int) -> jax.Array:
        """Per-level head over the NEW tokens' outputs of `phase`."""
        return self.head_levels[phase](self.ln_levels[phase](x))

    def depth_phase(self, h: jax.Array, top: Optional[jax.Array],
                    mid_local: Optional[jax.Array], phase: int):
        """Run the depth stack on the static-length prefix for `phase`
        (0: 1 token -> top logits; 1: 5 tokens -> mid logits;
        2: 21 tokens -> bottom logits in pyramid order). Recomputes the
        prefix instead of caching (<=21 tokens x 4 layers) — the reference
        behavior; `depth_phase_cached` is the serving-path default (exact,
        see its docstring).

        h: [B, D]; top: [B]; mid_local: [B, 4] mid codes in local raster
        (group) order.
        """
        hs = [self._phase_inputs(h, None, None, 0)]
        if phase >= 1:
            hs.append(self._phase_inputs(None, top, None, 1))
        if phase == 2:
            hs.append(self._phase_inputs(None, top, mid_local, 2))
        x = jnp.concatenate(hs, axis=1)
        T = x.shape[1]
        mask = jnp.asarray(M.level3(self.parallel_type)[:T, :T])
        for blk in self.depths:
            x = blk(x, mask=mask)
        if phase == 0:
            return self._phase_head(x[:, 0, :], 0)
        if phase == 1:
            return self._phase_head(x[:, 1:5, :], 1)
        return self._phase_head(x[:, 5:21, :], 2)

    def depth_phase_cached(self, h: Optional[jax.Array],
                           top: Optional[jax.Array],
                           mid_local: Optional[jax.Array],
                           depth_kv, phase: int):
        """KV-cached depth phase: process ONLY the tokens entering at
        `phase` against the cached K/V of the earlier phases, extending the
        cache. Returns (logits for this phase's level, new depth_kv).

        EXACT same math as `depth_phase`'s prefix recompute: a phase-p
        token's visible columns under the 21x21 mask
        (`ops/masks.level3_decode`) are identical whether its K/V come from
        this pass or were cached by the earlier one, so activations match
        bit-for-bit up to float reassociation. Cuts the depth-stack token
        passes per cell from 1+5+21=27 to 1+4+16=21.

        Phase 0 exploits the single-token shortcut (softmax over one
        visible key is identically 1, so attention output IS v — mirrors
        HierarchicalGPT.depth_first_logits).
        """
        from .layers import tiny_attention
        if phase == 0:
            x = self._phase_inputs(h, None, None, 0)
            ks, vs = [], []
            for blk in self.depths:
                xn = blk.ln1(x)
                a = blk.attn
                w_kv = jnp.concatenate(
                    [a.key.variables['params']['kernel'],
                     a.value.variables['params']['kernel']], axis=1)
                kv = jnp.dot(xn, w_kv.astype(xn.dtype))
                if a.attn_bias:
                    b_kv = jnp.concatenate(
                        [a.key.variables['params']['bias'],
                         a.value.variables['params']['bias']])
                    kv = kv + b_kv.astype(xn.dtype)
                k, v = jnp.split(kv, 2, axis=-1)
                x = x + a.proj(v)
                x = x + blk._mlp(blk.ln2(x), True)
                ks.append(k)
                vs.append(v)
            return self._phase_head(x[:, 0, :], 0), (ks, vs)

        x = self._phase_inputs(None, top, mid_local, phase)
        t_past = 1 if phase == 1 else 5
        t_new = x.shape[1]
        mask = jnp.asarray(M.level3_decode(self.parallel_type, t_past,
                                           t_new))
        ks, vs = depth_kv
        nh = self.hpd.n_heads
        new_ks, new_vs = [], []
        for i, blk in enumerate(self.depths):
            xn = blk.ln1(x)
            q, k_new, v_new = jnp.split(blk.attn._fused_qkv_flat(xn), 3,
                                        axis=-1)
            k_flat = jnp.concatenate([ks[i], k_new], axis=1)
            v_flat = jnp.concatenate([vs[i], v_new], axis=1)
            y = tiny_attention(q, k_flat, v_flat, nh, mask=mask)
            x = x + blk.attn.proj(y)
            x = x + blk._mlp(blk.ln2(x), True)
            new_ks.append(k_flat)
            new_vs.append(v_flat)
        return self._phase_head(x, phase), (new_ks, new_vs)
