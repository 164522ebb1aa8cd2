"""VQGAN-style conv backbone in flax.linen, NHWC layout.

TPU re-design of the reference encoder/decoder stack
(`hqvae/models/stage1/modules/layers.py:12-465`): identical math (GroupNorm-32
eps 1e-6, swish, 3x3 resblocks, single-head conv-QKV mid attention, asymmetric
stride-2 downsampling) but NHWC so convs tile directly onto the MXU, with a
`dtype` knob for bf16 activations (params stay f32).

Faithfully replicated quirk: the `curr_res` bookkeeping that decides where
attention blocks appear ignores `use_init_downsample` (`layers.py:220-245`),
so e.g. the ImageNet config has no encoder down-attention even though the real
spatial size does hit 16 — parity with released checkpoints requires copying
this behaviour, not the "intended" one.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def groupnorm(name: str, dtype=jnp.float32) -> nn.GroupNorm:
    """GroupNorm(num_groups=32, eps=1e-6, affine) (`layers.py:17-21`)."""
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype, name=name)


_INT8_DECODE_SCOPE = [False]


@contextlib.contextmanager
def int8_decode_scope():
    """Trace-time scope marking a serving pixel-decode region: the opt-in
    A8W8 conv path (HQT_INT8_DECODE=1) engages ONLY inside it. The samplers'
    decode call sites enter it; encoders, training steps, and eval
    reconstructions never do — so the env var cannot leak int8 (with its
    zero-gradient round/clip) into code extraction or training graphs."""
    prev = _INT8_DECODE_SCOPE[0]
    _INT8_DECODE_SCOPE[0] = True
    try:
        yield
    finally:
        _INT8_DECODE_SCOPE[0] = prev


def _int8_conv_active(x) -> bool:
    """A8W8 conv path gate: opt-in via HQT_INT8_DECODE=1 and only within
    an `int8_decode_scope()` (the serving decode call sites), only for bf16
    activations (the serving dtype — f32 parity paths never see it)."""
    return (_INT8_DECODE_SCOPE[0]
            and os.environ.get('HQT_INT8_DECODE') == '1'
            and x.dtype == jnp.bfloat16 and x.ndim == 4)


_INT8_CALIB_SCOPE = [False]


@contextlib.contextmanager
def int8_calibration_scope():
    """Trace-time scope for activation-range calibration: every
    QuantizableConv records its input absmax into the 'int8_calib'
    collection (run `apply(..., mutable=['int8_calib'])` on a
    representative decode batch inside this scope). The recorded ranges
    become static quantization scales via `int8_scales_from_calib`."""
    prev = _INT8_CALIB_SCOPE[0]
    _INT8_CALIB_SCOPE[0] = True
    try:
        yield
    finally:
        _INT8_CALIB_SCOPE[0] = prev


def int8_scales_from_calib(calib_col):
    """Convert a collected 'int8_calib' collection (per-conv activation
    absmax) into the 'act_scales' collection QuantizableConv consumes
    (scale = absmax / 127, symmetric int8)."""
    from collections.abc import Mapping

    def walk(t):
        if isinstance(t, Mapping):
            return {('scale' if k == 'absmax' else k): walk(v)
                    for k, v in t.items()}
        return jnp.maximum(jnp.asarray(t, jnp.float32), 1e-8) / 127.0

    return walk(calib_col)


class QuantizableConv(nn.Conv):
    """nn.Conv with an optional A8W8 int8 path (same params/checkpoints).

    Quantization: activations per-tensor dynamic symmetric int8
    (scale = max|x|/127 computed on the fly), weights per-output-channel
    symmetric int8; the conv accumulates int32 on the MXU and dequantizes
    into the activation dtype. Measured on v5e at decoder shapes
    ([128,256,256,128] 3x3): 1.38x the bf16 conv. The reference has no
    analogue (its decode runs fp16 autocast) — this is an opt-in serving
    mode, off by default; bench reports it as a separate metric with the
    PSNR-vs-bf16 figure from scripts/measure_int8_decode.py.
    """

    @nn.compact
    def __call__(self, x):
        if _INT8_CALIB_SCOPE[0] and x.ndim == 4:
            # activation-range calibration pass (bf16/f32 math unchanged):
            # running max across calls/chunks
            self.sow('int8_calib', 'absmax',
                     jnp.max(jnp.abs(x.astype(jnp.float32))),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.zeros((), jnp.float32))

        def _is_one(d):
            return d is None or d == 1 or (not isinstance(d, int)
                                           and all(v == 1 for v in d))
        if not (_int8_conv_active(x)
                # the int8 branch re-implements only the standard dense
                # conv; grouped/dilated convs fall back to bf16 rather
                # than silently computing a different convolution
                and self.feature_group_count == 1
                and _is_one(self.kernel_dilation)
                and _is_one(self.input_dilation)):
            return super().__call__(x)
        # materialize the standard nn.Conv params (identical names/shapes)
        # with a kernel-sized-spatial dummy call (VALID-padded convs need
        # at least the kernel extent); XLA discards the tiny conv
        kh, kw = self.kernel_size
        _ = super().__call__(x[:1, :kh, :kw, :])
        kernel = self.variables['params']['kernel']   # [Kh, Kw, I, O]
        bias = self.variables['params'].get('bias')

        xf = x.astype(jnp.float32)
        if self.has_variable('act_scales', 'scale'):
            # static (calibrated) scale: skips the dynamic max reduction
            # and its serialization barrier — the overhead that limited
            # dynamic A8W8 to ~1.07x e2e. Out-of-range activations
            # saturate at +-127 (standard PTQ behavior).
            x_scale = self.get_variable('act_scales',
                                        'scale').astype(jnp.float32)
        else:
            x_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
        kf = kernel.astype(jnp.float32)
        w_scale = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)),
                              1e-8) / 127.0            # [O]
        wq = jnp.clip(jnp.round(kf / w_scale), -127, 127).astype(jnp.int8)

        pad = self.padding
        if pad == 'VALID':
            pad = [(0, 0), (0, 0)]
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ('NHWC', 'HWIO', 'NHWC'))
        yq = jax.lax.conv_general_dilated(
            xq, wq, self.strides, pad, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = yq.astype(jnp.float32) * (x_scale * w_scale)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(x.dtype)


def conv(features: int, kernel: int, stride: int = 1, padding=None,
         name: Optional[str] = None, dtype=jnp.float32) -> nn.Conv:
    if padding is None:
        padding = [(kernel // 2, kernel // 2)] * 2 if kernel > 1 else 'VALID'
    return QuantizableConv(features, (kernel, kernel),
                           strides=(stride, stride),
                           padding=padding, name=name, dtype=dtype)


class Upsample(nn.Module):
    """Nearest 2x upsample, optional 3x3 conv (`layers.py:35-53`)."""
    with_conv: bool
    scale: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, self.scale, axis=1), self.scale, axis=2)
        if self.with_conv:
            x = conv(x.shape[-1], 3, name='conv', dtype=self.dtype)(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv with asymmetric (0,1,0,1) padding, or 2x2 avg-pool
    (`layers.py:56-75`)."""
    with_conv: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv(x.shape[-1], 3, stride=2, padding='VALID', name='conv',
                     dtype=self.dtype)(x)
        else:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class ResnetBlock(nn.Module):
    """norm-swish-conv x2 with 1x1 (or 3x3) channel shortcut
    (`layers.py:78-133`)."""
    out_channels: Optional[int] = None
    conv_shortcut: bool = False
    pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        h = groupnorm('norm1', self.dtype)(x)
        h = swish(h)
        h = conv(out_ch, 3, name='conv1', dtype=self.dtype)(h)
        h = groupnorm('norm2', self.dtype)(h)
        h = swish(h)
        h = nn.Dropout(self.pdrop)(h, deterministic=deterministic)
        h = conv(out_ch, 3, name='conv2', dtype=self.dtype)(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = conv(out_ch, 3, name='conv_shortcut', dtype=self.dtype)(x)
            else:
                x = conv(out_ch, 1, name='nin_shortcut', dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full attention over spatial positions with 1x1-conv QKV
    (`layers.py:136-186`). In NHWC the QKV projections and the two attention
    contractions are plain MXU matmuls."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = groupnorm('norm', self.dtype)(x)
        q = conv(C, 1, name='q', dtype=self.dtype)(h).reshape(B, H * W, C)
        k = conv(C, 1, name='k', dtype=self.dtype)(h).reshape(B, H * W, C)
        v = conv(C, 1, name='v', dtype=self.dtype)(h).reshape(B, H * W, C)
        att = jnp.einsum('bqc,bkc->bqk', q, k,
                         preferred_element_type=jnp.float32)
        att = att * (C ** -0.5)
        att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
        out = jnp.einsum('bqk,bkc->bqc', att, v).reshape(B, H, W, C)
        out = conv(C, 1, name='proj_out', dtype=self.dtype)(out)
        return x + out


class Encoder(nn.Module):
    """Downsampling encoder (`layers.py:189-297`)."""
    ch: int
    out_ch: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    pdrop: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 256
    double_z: bool = False
    use_init_downsample: bool = False
    use_mid_block: bool = True
    use_attn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ret_bottom: bool = False, deterministic: bool = True):
        num_resolutions = len(self.ch_mult)
        if self.use_init_downsample:
            h = conv(self.ch, 4, stride=2, padding=[(1, 1), (1, 1)],
                     name='conv_in', dtype=self.dtype)(x)
        else:
            h = conv(self.ch, 3, name='conv_in', dtype=self.dtype)(x)

        curr_res = self.resolution
        h_prev = None
        for i_level in range(num_resolutions):
            block_out = self.ch * self.ch_mult[i_level]
            use_attn_here = curr_res in self.attn_resolutions and self.use_attn
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(out_channels=block_out, pdrop=self.pdrop,
                                name=f'down_{i_level}_block_{i_block}',
                                dtype=self.dtype)(h, deterministic)
                if use_attn_here:
                    h = AttnBlock(name=f'down_{i_level}_attn_{i_block}',
                                  dtype=self.dtype)(h)
            if i_level != num_resolutions - 1:
                h_prev = h
                h = Downsample(self.resamp_with_conv,
                               name=f'down_{i_level}_downsample',
                               dtype=self.dtype)(h)
                curr_res = curr_res // 2

        if self.use_mid_block:
            h = ResnetBlock(pdrop=self.pdrop, name='mid_block_1',
                            dtype=self.dtype)(h, deterministic)
            if self.use_attn:
                h = AttnBlock(name='mid_attn_1', dtype=self.dtype)(h)
            h = ResnetBlock(pdrop=self.pdrop, name='mid_block_2',
                            dtype=self.dtype)(h, deterministic)

        h = groupnorm('norm_out', self.dtype)(h)
        h = swish(h)
        out_c = 2 * self.z_channels if self.double_z else self.z_channels
        h = conv(out_c, 3, name='conv_out', dtype=self.dtype)(h)
        if ret_bottom:
            return h, h_prev
        return h


class Decoder(nn.Module):
    """Mirrored upsampling decoder (`layers.py:300-410`)."""
    ch: int
    out_ch: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    pdrop: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 256
    double_z: bool = False
    use_init_downsample: bool = False
    use_mid_block: bool = True
    use_attn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, deterministic: bool = True,
                 ret_pre_out: bool = False):
        num_resolutions = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_resolutions - 1]
        curr_res = self.resolution // 2 ** (
            num_resolutions if self.use_init_downsample else num_resolutions - 1)

        h = conv(block_in, 3, name='conv_in', dtype=self.dtype)(z)

        if self.use_mid_block:
            h = ResnetBlock(pdrop=self.pdrop, name='mid_block_1',
                            dtype=self.dtype)(h, deterministic)
            if self.use_attn:
                h = AttnBlock(name='mid_attn_1', dtype=self.dtype)(h)
            h = ResnetBlock(pdrop=self.pdrop, name='mid_block_2',
                            dtype=self.dtype)(h, deterministic)

        for i_level in reversed(range(num_resolutions)):
            block_out = self.ch * self.ch_mult[i_level]
            use_attn_here = curr_res in self.attn_resolutions and self.use_attn
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(out_channels=block_out, pdrop=self.pdrop,
                                name=f'up_{i_level}_block_{i_block}',
                                dtype=self.dtype)(h, deterministic)
                if use_attn_here:
                    h = AttnBlock(name=f'up_{i_level}_attn_{i_block}',
                                  dtype=self.dtype)(h)
            if i_level != 0 or self.use_init_downsample:
                h = Upsample(self.resamp_with_conv,
                             name=f'up_{i_level}_upsample',
                             dtype=self.dtype)(h)
                curr_res = curr_res * 2

        h = groupnorm('norm_out', self.dtype)(h)
        h = swish(h)
        pre = h
        h = conv(self.out_ch, 3, name='conv_out', dtype=self.dtype)(h)
        if ret_pre_out:
            # pre-conv_out features, used by the adaptive GAN weight
            # (`discriminator.py:72-83` differentiates w.r.t. the last conv)
            return h, pre
        return h


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init
    (`modules/utils.py:11-93`); used by the discriminator's 'actnorm' mode."""
    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        loc = self.param('loc', nn.initializers.zeros, (C,))
        scale = self.param('scale', nn.initializers.ones, (C,))
        return scale * (x + loc)


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (`layers.py:413-465`).

    Sequential index naming matches torch's nn.Sequential so checkpoints map
    1:1 (conv indices depend on n_layers and norm placement).
    """
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    norm_type: str = 'bn'
    dtype: jnp.dtype = jnp.float32

    def _norm(self, name):
        if self.norm_type == 'bn':
            return nn.BatchNorm(use_running_average=True, momentum=0.9,
                                epsilon=1e-5, name=name, dtype=self.dtype)
        if self.norm_type == 'gn':
            return groupnorm(name, self.dtype)
        if self.norm_type == 'actnorm':
            return ActNorm(name=name)
        raise ValueError(f'{self.norm_type} is not supported..')

    @nn.compact
    def __call__(self, x):
        kw, padw = 4, 1
        idx = 0
        h = nn.Conv(self.ndf, (kw, kw), strides=(2, 2),
                    padding=[(padw, padw)] * 2, name=f'main_{idx}',
                    dtype=self.dtype)(x)
        idx += 2  # conv + leaky-relu
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        use_bias = self.norm_type == 'actnorm'
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf_mult, (kw, kw), strides=(2, 2),
                        padding=[(padw, padw)] * 2, use_bias=use_bias,
                        name=f'main_{idx}', dtype=self.dtype)(h)
            h = self._norm(f'main_{idx + 1}')(h)
            h = nn.leaky_relu(h, 0.2)
            idx += 3
        nf_mult = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf_mult, (kw, kw), strides=(1, 1),
                    padding=[(padw, padw)] * 2, use_bias=use_bias,
                    name=f'main_{idx}', dtype=self.dtype)(h)
        h = self._norm(f'main_{idx + 1}')(h)
        h = nn.leaky_relu(h, 0.2)
        idx += 3
        h = nn.Conv(1, (kw, kw), strides=(1, 1), padding=[(padw, padw)] * 2,
                    name=f'main_{idx}', dtype=self.dtype)(h)
        return h
