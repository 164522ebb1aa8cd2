"""Stage-1 generators: VQGAN, VQ-VAE-2-style VQGAN2, the 2-level HQ-VAE
(SimRQGAN2) and the N-level HQ-VAE.

TPU re-designs of `hqvae/models/stage1/generator.py:17-615`. Same math and
checkpoint-compatible parameterization (see `checkpoint.py` for the torch
state_dict mapping), but NHWC layout throughout, resampling as pure
reshape/matmul ops (`ops/resample.py`), and EMA codebooks in a mutable flax
collection so training steps stay pure.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import ResampleSpec, Stage1Hparams, VQGAN2Hparams, parse_resample
from ...ops import resample as rs
from .layers import Decoder, Encoder
from .quantizer import make_quantizer


def _encoder_kwargs(hp: Stage1Hparams, dtype) -> dict:
    return dict(ch=hp.ch, out_ch=hp.out_ch, ch_mult=tuple(hp.ch_mult),
                num_res_blocks=hp.num_res_blocks,
                attn_resolutions=tuple(hp.attn_resolutions), pdrop=hp.pdrop,
                in_channels=hp.in_channels, resolution=hp.resolution,
                z_channels=hp.z_channels, double_z=bool(hp.double_z),
                use_init_downsample=hp.use_init_downsample,
                use_mid_block=hp.use_mid_block, use_attn=hp.use_attn,
                dtype=dtype)


def top_embed_dim(spec: ResampleSpec, embed_dim: int,
                  levels_above: int = 1) -> int:
    """Codebook dim of a level `levels_above` pixel-(un)shuffles above the
    bottom (`generator.py:231,436`); non-shuffle resamplers keep the dim."""
    if spec.kind == 'pixelshuffle':
        return embed_dim * (spec.window * spec.window) ** levels_above
    return embed_dim


class ConvDown(nn.Module):
    """Stride-k kernel-k conv downsample ('conv<k>', `generator.py:235`),
    lowered to pixel-unshuffle + matmul (`ops/resample.py`)."""
    features: int
    window: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.window
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (k, k, cin, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return rs.space_to_depth_conv(x.astype(self.dtype),
                                      kernel.astype(self.dtype),
                                      bias.astype(self.dtype), k)


class ConvTransposeUp(nn.Module):
    """Stride-k kernel-k conv-transpose upsample ('conv<k>',
    `generator.py:236-240`), lowered to matmul + pixel-shuffle. Kernel kept in
    torch ConvTranspose2d layout [Cin, Cout, k, k] so checkpoints copy over
    without reordering."""
    features: int
    window: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.window
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (cin, self.features, k, k))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return rs.depth_to_space_conv_transpose(x.astype(self.dtype),
                                                kernel.astype(self.dtype),
                                                bias.astype(self.dtype), k)


class TorchConvTranspose(nn.Module):
    """General ConvTranspose2d(k, stride, padding) with torch semantics and
    torch kernel layout [Cin, Cout, kh, kw]; used by VQGAN2's 'deconv2d'
    upsample (`generator.py:121-123`, k=4 s=2 p=1)."""
    features: int
    kernel_size: int
    stride: int
    padding: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k, s, p = self.kernel_size, self.stride, self.padding
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (cin, self.features, k, k))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        # ConvTranspose == dilated conv with spatially-flipped kernel
        w = jnp.flip(kernel, axis=(-2, -1)).transpose(2, 3, 0, 1)  # HWIO
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(1, 1),
            padding=[(k - 1 - p, k - 1 - p)] * 2,
            lhs_dilation=(s, s),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + bias.astype(self.dtype)


class _ResampleMixin:
    """Parameter-free resampling dispatch shared by the HQ generators."""

    def _make_resample(self, spec: ResampleSpec, embed_dim: int,
                       down_name: str, up_name: str):
        """Returns parametric (down, up) modules or None for pure ops."""
        if spec.kind == 'conv':
            return (ConvDown(embed_dim, spec.window, name=down_name,
                             dtype=self.dtype),
                    ConvTransposeUp(embed_dim, spec.window, name=up_name,
                                    dtype=self.dtype))
        return None, None

    @staticmethod
    def _down_fn(spec: ResampleSpec, mod):
        if spec.kind in ('avgpool', 'nearest'):
            return lambda x: rs.avg_pool(x, spec.window)
        if spec.kind == 'pixelshuffle':
            return lambda x: rs.pixel_unshuffle(x, spec.window)
        return mod

    @staticmethod
    def _up_fn(spec: ResampleSpec, mod):
        if spec.kind in ('avgpool', 'nearest'):
            return lambda x: rs.upsample_nearest(x, spec.window)
        if spec.kind == 'pixelshuffle':
            return lambda x: rs.pixel_shuffle(x, spec.window)
        return mod


class VQGANGenerator(nn.Module):
    """Plain VQGAN: encode -> quant_conv -> quantize -> decode
    (`generator.py:17-65`)."""
    n_embed: int
    embed_dim: int
    ema_update: bool
    hparams: Stage1Hparams
    dtype: jnp.dtype = jnp.float32
    ema_axis_name: Optional[str] = None
    use_pallas: Optional[bool] = None

    def setup(self):
        kw = _encoder_kwargs(self.hparams, self.dtype)
        self.encoder = Encoder(**kw, name='encoder')
        self.decoder = Decoder(**kw, name='decoder')
        self.quantize = make_quantizer(self.ema_update, self.embed_dim,
                                       self.n_embed,
                                       ema_axis_name=self.ema_axis_name,
                                       use_pallas=self.use_pallas,
                                       name='quantize')
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1), name='quant_conv',
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.hparams.z_channels, (1, 1),
                                       name='post_quant_conv',
                                       dtype=self.dtype)

    def __call__(self, x, global_step=None, update_ema: bool = False,
                 deterministic: bool = True):
        quant, diff, code = self.encode(x, update_ema, deterministic)
        dec = self.decode(quant, deterministic)
        return dec, diff, code

    def encode(self, x, update_ema: bool = False, deterministic: bool = True):
        h = self.encoder(x, deterministic=deterministic)
        h = self.quant_conv(h)
        quant, diff, code = self.quantize(h, update_ema=update_ema)
        return quant, diff, code

    def decode(self, quant, deterministic: bool = True,
               ret_pre_out: bool = False):
        quant = self.post_quant_conv(quant)
        return self.decoder(quant, deterministic=deterministic,
                            ret_pre_out=ret_pre_out)

    def decode_code(self, code):
        quant = self.quantize.get_codebook_entry(code)
        return self.decode(quant)

    def get_codes(self, x):
        h = self.encoder(x)
        h = self.quant_conv(h)
        _, _, code = self.quantize(h)
        return code.reshape(x.shape[0], -1)


class SimRQGAN2Generator(nn.Module, _ResampleMixin):
    """The paper's 2-level HQ-VAE (`generator.py:176-395`).

    encode: h_b = quant_conv_b(encoder(x)); h_t = down(h_b); quantize top;
    bottom quantizes the residual h_b - up(quant_t) (`generator.py:298-310`).
    decode: concat [up(quant_t), quant_b] -> post_quant_conv_b -> decoder
    (`generator.py:312-321`).
    """
    n_embed: int
    embed_dim: int
    ema_update: bool
    hparams: Stage1Hparams
    hparams_aux: VQGAN2Hparams
    dtype: jnp.dtype = jnp.float32
    ema_axis_name: Optional[str] = None
    use_pallas: Optional[bool] = None

    def setup(self):
        assert self.hparams.z_channels % 2 == 0
        assert self.hparams_aux.decoding_type == 'concat'
        kw = _encoder_kwargs(self.hparams, self.dtype)
        self.encoder = Encoder(**kw, name='encoder')
        self.decoder = Decoder(**kw, name='decoder')

        spec = parse_resample(self.hparams_aux.upsample)
        self.spec = spec
        self.bottom_window = spec.window
        down_mod, up_mod = self._make_resample(spec, self.embed_dim,
                                               'down_t', 'upsample_t')
        self.down_t = self._down_fn(spec, down_mod)
        self.upsample_t = self._up_fn(spec, up_mod)

        restart = bool(self.hparams_aux.restart_unused_codes)
        self.quantize_t = make_quantizer(self.ema_update,
                                         top_embed_dim(spec, self.embed_dim),
                                         self.n_embed,
                                         restart_unused_codes=restart,
                                         ema_axis_name=self.ema_axis_name,
                                         use_pallas=self.use_pallas,
                                         name='quantize_t')
        self.quantize_b = make_quantizer(self.ema_update, self.embed_dim,
                                         self.n_embed,
                                         restart_unused_codes=restart,
                                         ema_axis_name=self.ema_axis_name,
                                         use_pallas=self.use_pallas,
                                         name='quantize_b')
        self.quant_conv_b = nn.Conv(self.embed_dim, (1, 1),
                                    name='quant_conv_b', dtype=self.dtype)
        self.post_quant_conv_b = nn.Conv(self.hparams.z_channels, (1, 1),
                                         name='post_quant_conv_b',
                                         dtype=self.dtype)
        self.latent_dim = self.hparams.attn_resolutions[0]

    def __call__(self, x, global_step: Optional[int] = None,
                 update_ema: bool = False, deterministic: bool = True,
                 bottom_bypass: bool = False):
        """Returns (dec, (diff_t, diff_b, mean|resid|), codes).

        `bottom_bypass=True` reproduces the `bottom_start` curriculum branch
        returning (dec_t, dec_tb) (`generator.py:266-275`); the step
        comparison against `bottom_start` is the caller's responsibility
        (static under jit).
        """
        quant_t, quant_b, diff_t, diff_b, code = self.encode(
            x, update_ema, deterministic)
        dec_tb = self.decode(quant_t, quant_b, deterministic)
        if bottom_bypass:
            dec_t = self.decode(quant_t, jnp.zeros_like(quant_b),
                                deterministic)
            dec = (dec_t, dec_tb)
        else:
            dec = dec_tb
        diff = (diff_t, diff_b, jnp.mean(jnp.abs(code[2])))
        return dec, diff, code

    def forward_topbottom(self, x, deterministic: bool = True):
        """(dec_t, dec_b, dec_tb) visualization split (`generator.py:286-296`)."""
        quant_t, quant_b, diff_t, diff_b, code = self.encode(
            x, False, deterministic)
        dec_t = self.decode(quant_t, jnp.zeros_like(quant_b), deterministic)
        dec_b = self.decode(jnp.zeros_like(quant_t), quant_b, deterministic)
        dec_tb = self.decode(quant_t, quant_b, deterministic)
        return (dec_t, dec_b, dec_tb), (diff_t, diff_b), code

    def encode(self, x, update_ema: bool = False, deterministic: bool = True):
        h_b = self.quant_conv_b(self.encoder(x, deterministic=deterministic))
        h_t = self.down_t(h_b)
        quant_t, diff_t, code_t = self.quantize_t(h_t, update_ema=update_ema)
        h_b = h_b - self.upsample_t(quant_t)
        if self.hparams_aux.shared_codebook:
            quant_b, diff_b, code_b = self.quantize_t(h_b,
                                                      update_ema=update_ema)
        else:
            quant_b, diff_b, code_b = self.quantize_b(h_b,
                                                      update_ema=update_ema)
        return quant_t, quant_b, diff_t, diff_b, (code_t, code_b, h_b)

    def decode(self, quant_t, quant_b, deterministic: bool = True,
               ret_pre_out: bool = False):
        quant_t = self.upsample_t(quant_t)
        quant = jnp.concatenate([quant_t, quant_b], axis=-1)
        quant = self.post_quant_conv_b(quant)
        return self.decoder(quant, deterministic=deterministic,
                            ret_pre_out=ret_pre_out)

    def decode_code(self, code_t: Optional[jax.Array],
                    code_b: Optional[jax.Array]) -> jax.Array:
        """Pixels from codes; either level may be None -> zeros
        (`generator.py:323-367`). code_t: [B, Ht, Wt], code_b: [B, Hb, Wb]."""
        assert code_t is not None or code_b is not None
        w = self.bottom_window
        quant_t = quant_b = None
        if code_t is not None:
            quant_t = self.quantize_t.get_codebook_entry(code_t)
        if code_b is not None:
            quant_b = self.quantize_b.get_codebook_entry(code_b)
        if quant_t is None:
            B, Hb, Wb, C = quant_b.shape
            ct = C * w * w if self.spec.kind == 'pixelshuffle' else C
            quant_t = jnp.zeros((B, Hb // w, Wb // w, ct), quant_b.dtype)
        if quant_b is None:
            B, Ht, Wt, C = quant_t.shape
            cb = C // (w * w) if self.spec.kind == 'pixelshuffle' else C
            quant_b = jnp.zeros((B, Ht * w, Wt * w, cb), quant_t.dtype)
        return self.decode(quant_t, quant_b)

    def get_codes(self, x) -> Tuple[jax.Array, jax.Array]:
        _, _, _, _, code = self.encode(x)
        return code[0], code[1]

    def get_soft_codes(self, x, temp: float = 1.0, stochastic: bool = False,
                       rng: Optional[jax.Array] = None):
        """(codes, soft_codes) for soft-label stage-2 training
        (`generator.py:372-387`)."""
        h_b = self.quant_conv_b(self.encoder(x))
        h_t = self.down_t(h_b)
        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        quant_t, _, code_t, soft_t = self.quantize_t.get_soft_codes(
            h_t, temp, stochastic, r1)
        h_b = h_b - self.upsample_t(quant_t)
        qb = self.quantize_t if self.hparams_aux.shared_codebook else self.quantize_b
        _, _, code_b, soft_b = qb.get_soft_codes(h_b, temp, stochastic, r2)
        return (code_t, code_b), (soft_t, soft_b)


class VQGAN2Generator(nn.Module):
    """VQ-VAE-2-style two-codebook baseline (`generator.py:68-173`)."""
    n_embed: int
    embed_dim: int
    ema_update: bool
    hparams: Stage1Hparams
    hparams_aux: VQGAN2Hparams
    dtype: jnp.dtype = jnp.float32
    ema_axis_name: Optional[str] = None
    use_pallas: Optional[bool] = None

    def setup(self):
        hp = self.hparams
        assert hp.z_channels % 2 == 0
        assert self.hparams_aux.decoding_type in ('concat', 'sum')
        kw = _encoder_kwargs(hp, self.dtype)
        self.encoder = Encoder(**kw, name='encoder')
        kw_dec = dict(kw, ch_mult=tuple(hp.ch_mult[:-1]),
                      attn_resolutions=(hp.attn_resolutions[0] * 2,))
        self.decoder = Decoder(**kw_dec, name='decoder')
        kw_top = dict(kw, out_ch=hp.z_channels,
                      ch_mult=(1, hp.ch_mult[-1]),
                      resolution=hp.attn_resolutions[0] * 2,
                      use_init_downsample=False)
        self.decoder_top = Decoder(**kw_top, name='decoder_top')

        self.quantize_t = make_quantizer(self.ema_update, self.embed_dim,
                                         self.n_embed,
                                         ema_axis_name=self.ema_axis_name,
                                         use_pallas=self.use_pallas,
                                         name='quantize_t')
        self.quantize_b = make_quantizer(self.ema_update, self.embed_dim,
                                         self.n_embed,
                                         ema_axis_name=self.ema_axis_name,
                                         use_pallas=self.use_pallas,
                                         name='quantize_b')
        ch_ratio = 2 if self.hparams_aux.decoding_type == 'concat' else 1
        self.quant_conv_t = nn.Conv(self.embed_dim, (1, 1),
                                    name='quant_conv_t', dtype=self.dtype)
        self.quant_conv_b = nn.Conv(self.embed_dim, (1, 1),
                                    name='quant_conv_b', dtype=self.dtype)
        if self.hparams_aux.upsample == 'deconv2d':
            self.upsample_deconv = TorchConvTranspose(
                hp.z_channels // ch_ratio, 4, 2, 1, name='upsample_t',
                dtype=self.dtype)
            self.upsample_conv = None
        elif self.hparams_aux.upsample == 'nearest':
            self.upsample_conv = nn.Conv(hp.z_channels // ch_ratio, (3, 3),
                                         padding=[(1, 1)] * 2,
                                         name='upsample_t_0',
                                         dtype=self.dtype)
            self.upsample_deconv = None
        else:
            raise ValueError(
                f'{self.hparams_aux.upsample} is not a supported upsample mode')
        self.post_quant_conv_t = nn.Conv(hp.z_channels, (1, 1),
                                         name='post_quant_conv_t',
                                         dtype=self.dtype)
        self.post_quant_conv_b = nn.Conv(hp.z_channels // ch_ratio, (1, 1),
                                         name='post_quant_conv_b',
                                         dtype=self.dtype)

    def _upsample_t(self, x):
        if self.upsample_deconv is not None:
            return self.upsample_deconv(x)
        return rs.upsample_nearest(self.upsample_conv(x), 2)

    def __call__(self, x, global_step: Optional[int] = None,
                 update_ema: bool = False, deterministic: bool = True,
                 bottom_bypass: bool = False):
        quant_t, quant_b, diff_t, diff_b, code = self.encode(
            x, update_ema, deterministic)
        dec = self.decode(quant_t, quant_b, bottom_bypass, deterministic)
        return dec, (diff_t, diff_b), code

    def encode(self, x, update_ema: bool = False, deterministic: bool = True):
        h_t, h_b = self.encoder(x, ret_bottom=True,
                                deterministic=deterministic)
        h_t = self.quant_conv_t(h_t)
        quant_t, diff_t, code_t = self.quantize_t(h_t, update_ema=update_ema)
        d_b = self.decoder_top(self.post_quant_conv_t(quant_t),
                               deterministic=deterministic)
        if self.hparams_aux.decoding_type == 'concat':
            h_b = jnp.concatenate([h_b, d_b], axis=-1)
        else:
            h_b = h_b + d_b
        h_b = self.quant_conv_b(h_b)
        if self.hparams_aux.shared_codebook:
            quant_b, diff_b, code_b = self.quantize_t(h_b,
                                                      update_ema=update_ema)
        else:
            quant_b, diff_b, code_b = self.quantize_b(h_b,
                                                      update_ema=update_ema)
        return quant_t, quant_b, diff_t, diff_b, (code_t, code_b)

    def decode(self, quant_t, quant_b, bottom_bypass: bool = False,
               deterministic: bool = True):
        quant_t = self._upsample_t(quant_t)
        quant_b = self.post_quant_conv_b(quant_b)
        if bottom_bypass:
            quant_b = jnp.zeros_like(quant_b)
        if self.hparams_aux.decoding_type == 'concat':
            quant = jnp.concatenate([quant_t, quant_b], axis=-1)
        else:
            quant = quant_t + quant_b
        return self.decoder(quant, deterministic=deterministic)


class HQVAEGenerator(nn.Module, _ResampleMixin):
    """N-level HQ-VAE (`generator.py:398-615`): per-level residual
    quantization over a resolution pyramid."""
    n_embed_levels: Sequence[int]
    embed_dim: int
    ema_update: bool
    hparams: Stage1Hparams
    hparams_aux: VQGAN2Hparams
    dtype: jnp.dtype = jnp.float32
    ema_axis_name: Optional[str] = None
    use_pallas: Optional[bool] = None

    def setup(self):
        hp = self.hparams
        assert hp.z_channels % 2 == 0
        assert self.hparams_aux.decoding_type in ('add', 'concat')
        kw = _encoder_kwargs(hp, self.dtype)
        self.encoder = Encoder(**kw, name='encoder')
        self.decoder = Decoder(**kw, name='decoder')

        self.code_levels = int(self.hparams_aux.code_levels)
        spec = parse_resample(self.hparams_aux.upsample)
        self.spec = spec
        restart = bool(self.hparams_aux.restart_unused_codes)

        down_mods, up_mods, quantizers = [], [], []
        bottom_window = 1
        for ci in range(self.code_levels - 1):
            dm, um = self._make_resample(spec, self.embed_dim,
                                         f'downsamples_{ci}',
                                         f'upsamples_{ci}')
            down_mods.append(dm)
            up_mods.append(um)
            bottom_window *= spec.window
            quantizers.append(make_quantizer(
                self.ema_update,
                top_embed_dim(spec, self.embed_dim,
                              self.code_levels - ci - 1),
                self.n_embed_levels[ci], restart_unused_codes=restart,
                ema_axis_name=self.ema_axis_name, use_pallas=self.use_pallas,
                name=f'quantizers_{ci}'))
        quantizers.append(make_quantizer(
            self.ema_update, self.embed_dim,
            self.n_embed_levels[self.code_levels - 1],
            restart_unused_codes=restart, ema_axis_name=self.ema_axis_name,
            use_pallas=self.use_pallas,
            name=f'quantizers_{self.code_levels - 1}'))
        self.down_mods = down_mods
        self.up_mods = up_mods
        self.quantizers = quantizers
        self.bottom_window = bottom_window

        self.quant_conv_b = nn.Conv(self.embed_dim, (1, 1),
                                    name='quant_conv_b', dtype=self.dtype)
        self.post_quant_conv_b = nn.Conv(hp.z_channels, (1, 1),
                                         name='post_quant_conv_b',
                                         dtype=self.dtype)
        self.latent_dim = hp.attn_resolutions[0]

    def _down(self, ci, x):
        return self._down_fn(self.spec, self.down_mods[ci])(x)

    def _up(self, ci, x):
        return self._up_fn(self.spec, self.up_mods[ci])(x)

    def __call__(self, x, global_step: Optional[int] = None,
                 update_ema: bool = False, deterministic: bool = True):
        quant, diffs, codes, resids = self.encode(
            x, update_ema=update_ema, deterministic=deterministic)
        dec = self.decode(quant, deterministic)
        resid_loss = sum(jnp.mean(r) for r in resids)
        return dec, diffs, list(codes) + [resid_loss]

    def encode(self, x, soft_codes: bool = False, temp: float = 1.0,
               stochastic: bool = False, rng: Optional[jax.Array] = None,
               update_ema: bool = False, deterministic: bool = True):
        """Pyramid residual quantization (`generator.py:532-568`)."""
        h_map = [self.quant_conv_b(self.encoder(x,
                                                deterministic=deterministic))]
        for ci in range(self.code_levels - 1):
            h_map.insert(0, self._down(ci, h_map[0]))

        resids, diffs, codes, softs = [], [], [], []
        recon = 0
        for qi, quantizer in enumerate(self.quantizers):
            _resid = h_map[qi] - recon
            if soft_codes:
                r = None
                if rng is not None:
                    rng, r = jax.random.split(rng)
                _quant, _diff, _code, _scode = quantizer.get_soft_codes(
                    _resid, temp, stochastic, r)
                softs.append(_scode)
            else:
                _quant, _diff, _code = quantizer(_resid, update_ema=update_ema)
            recon = _quant + recon
            if qi < self.code_levels - 1:
                recon = self._up(qi, recon)
            resids.append(_resid)
            diffs.append(_diff)
            codes.append(_code)

        if soft_codes:
            return recon, diffs, softs, codes, resids[1:]
        return recon, diffs, codes, resids[1:]

    def decode(self, quant, deterministic: bool = True,
               ret_pre_out: bool = False):
        quant = self.post_quant_conv_b(quant)
        return self.decoder(quant, deterministic=deterministic,
                            ret_pre_out=ret_pre_out)

    def decode_code(self, codes: List[Optional[jax.Array]]) -> jax.Array:
        """Pixels from per-level [B, H, W] codes; None -> zeros
        (`generator.py:577-599`)."""
        B = next(c.shape[0] for c in codes if c is not None)
        quant = 0
        for hi, (code, quantizer) in enumerate(zip(codes, self.quantizers)):
            if code is not None:
                _quant = quantizer.get_codebook_entry(code)
            else:
                K = int(self.latent_dim //
                        (self.spec.window ** (self.code_levels - hi - 1)))
                _quant = jnp.zeros((B, K, K, quantizer.dim), self.dtype)
            quant = quant + _quant
            if hi < self.code_levels - 1:
                quant = self._up(hi, quant)
        return self.decode(quant)

    def get_codes(self, x):
        return self.encode(x)[2]

    def get_soft_codes(self, x, temp: float = 1.0, stochastic: bool = False,
                       rng: Optional[jax.Array] = None):
        _, _, softs, codes, _ = self.encode(x, soft_codes=True, temp=temp,
                                            stochastic=stochastic, rng=rng)
        return codes, softs


def build_generator(cfg_stage1, dtype=jnp.float32,
                    ema_axis_name: Optional[str] = None,
                    use_pallas: Optional[bool] = None) -> nn.Module:
    """Generator dispatch by `stage1.type` (`models/__init__.py:50-80`)."""
    t = cfg_stage1.type
    common = dict(embed_dim=cfg_stage1.embed_dim,
                  ema_update=cfg_stage1.ema_update,
                  hparams=cfg_stage1.hparams, dtype=dtype,
                  ema_axis_name=ema_axis_name, use_pallas=use_pallas)
    if t == 'vqgan':
        return VQGANGenerator(n_embed=cfg_stage1.n_embed, **common)
    if t == 'vqgan2':
        return VQGAN2Generator(n_embed=cfg_stage1.n_embed,
                               hparams_aux=cfg_stage1.hparams_aux, **common)
    if t == 'simrqgan2':
        return SimRQGAN2Generator(n_embed=cfg_stage1.n_embed,
                                  hparams_aux=cfg_stage1.hparams_aux, **common)
    if t == 'hqvae':
        levels = cfg_stage1.hparams_aux.code_levels
        n_embed_levels = (list(cfg_stage1.n_embed_levels)
                          if cfg_stage1.n_embed_levels
                          else [cfg_stage1.n_embed] * levels)
        return HQVAEGenerator(n_embed_levels=n_embed_levels[:levels],
                              hparams_aux=cfg_stage1.hparams_aux, **common)
    raise ValueError(f'{t} is not supported..')
