"""Spatial up/down-sampling primitives in NHWC layout.

TPU-native equivalents of the resampling ops the reference selects from the
`hparams_aux.upsample` string (`generator.py:193-244`, `generator.py:401-449`):
AvgPool / nearest-interp, PixelUnshuffle / PixelShuffle, and stride-k
conv / conv-transpose. Channel orderings bit-match torch's NCHW semantics so
codebooks built on (un)shuffled channels transfer exactly.

All functions are pure, shape-static, and fuse into surrounding XLA programs;
the pixel-shuffle pair is pure data movement (reshape/transpose) which XLA
lowers to free layout changes where possible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """[B, H*r, W*r, C] -> [B, H, W, C*r*r].

    Output channel index = c*r*r + i*r + j, matching torch.nn.PixelUnshuffle
    so that top-codebook dimensions transfer 1:1.
    """
    B, Hr, Wr, C = x.shape
    H, W = Hr // r, Wr // r
    x = x.reshape(B, H, r, W, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H, W, C, i, j
    return x.reshape(B, H, W, C * r * r)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """[B, H, W, C*r*r] -> [B, H*r, W*r, C] (inverse of pixel_unshuffle)."""
    B, H, W, Cr2 = x.shape
    C = Cr2 // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, i, W, j, C
    return x.reshape(B, H * r, W * r, C)


def avg_pool(x: jax.Array, k: int) -> jax.Array:
    """[B, H, W, C] -> [B, H/k, W/k, C], mean over k x k windows."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // k, k, W // k, k, C)
    return x.mean(axis=(2, 4))


def upsample_nearest(x: jax.Array, scale: int) -> jax.Array:
    """Nearest-neighbour upsampling, equal to F.interpolate(mode='nearest')."""
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def space_to_depth_conv(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                        k: int) -> jax.Array:
    """Stride-k, kernel-k, pad-0 conv (the 'conv<k>' downsample,
    `generator.py:233-235`), computed as pixel-unshuffle + one MXU matmul.

    kernel: [k, k, Cin, Cout] (HWIO). Each output pixel sees one disjoint
    k x k input patch, so the conv is exactly a dense layer over unshuffled
    channels — avoids conv lowering entirely.
    """
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    patches = pixel_unshuffle(x, k)  # [B, H/k, W/k, Cin*k*k] (c-major, then i, j)
    # kernel index order in pixel_unshuffle output is (c, i, j) -> reorder HWIO
    w = kernel.transpose(2, 0, 1, 3).reshape(Cin * k * k, Cout)  # (c, i, j) major
    return patches @ w + bias


def depth_to_space_conv_transpose(x: jax.Array, kernel: jax.Array,
                                  bias: jax.Array, k: int) -> jax.Array:
    """Stride-k, kernel-k, pad-0 conv-transpose (the 'conv<k>'/'deconv2d'
    upsample, `generator.py:236-240`), computed as one matmul + pixel-shuffle.

    kernel: [Cin, Cout, k, k] in torch ConvTranspose2d layout. With
    stride == kernel size each input pixel paints a disjoint k x k output
    patch: out[h*k+i, w*k+j, o] = sum_c in[h, w, c] * kernel[c, o, i, j].
    """
    Cin, Cout = kernel.shape[0], kernel.shape[1]
    w = kernel.reshape(Cin, Cout * k * k)  # (o, i, j) minor — matches shuffle order
    y = x @ w  # [B, H, W, Cout*k*k]
    y = pixel_shuffle(y, k)
    return y + bias
