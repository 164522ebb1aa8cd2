"""FID-variant InceptionV3 in flax.

Re-implementation of the TF-FID Inception network the reference evaluates
with (`hqvae/utils/inception.py:30-80`, itself the pytorch-fid port): the
torchvision InceptionV3 topology with the FID modifications — avg-pool
branches exclude padding from the mean (count_include_pad=False), Mixed_7c's
pool branch is a max-pool, and the classifier has 1008 outputs. Inputs are
NHWC in [0, 1]; they are bilinearly resized to 299 and scaled to [-1, 1]
exactly as the reference does (`inception.py` resize_input/normalize_input).

Weights are NOT bundled (the reference hardcodes a private path,
`inception.py:22`); `load_torch_fid_inception` maps the public
pt_inception-2015-12-05 state_dict onto this module when provided.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def avg_pool_3x3_cip_false(x: jax.Array) -> jax.Array:
    """3x3 stride-1 pad-1 average pool with count_include_pad=False."""
    sums = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                                 (1, 1, 1, 1),
                                 [(0, 0), (1, 1), (1, 1), (0, 0)])
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                   (1, 1, 1, 1),
                                   [(0, 0), (1, 1), (1, 1), (0, 0)])
    return sums / counts


class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=0.001, frozen stats) + relu."""
    out_ch: int
    kernel: tuple
    stride: int = 1
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
                    use_bias=False, name='conv')(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=0.001,
                         name='bn')(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name='branch1x1')(x)
        b5 = BasicConv2d(48, (1, 1), name='branch5x5_1')(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name='branch5x5_2')(b5)
        b3 = BasicConv2d(64, (1, 1), name='branch3x3dbl_1')(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name='branch3x3dbl_2')(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name='branch3x3dbl_3')(b3)
        bp = avg_pool_3x3_cip_false(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name='branch3x3')(x)
        bd = BasicConv2d(64, (1, 1), name='branch3x3dbl_1')(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name='branch3x3dbl_2')(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name='branch3x3dbl_3')(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name='branch1x1')(x)
        b7 = BasicConv2d(c7, (1, 1), name='branch7x7_1')(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name='branch7x7_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name='branch7x7_3')(b7)
        bd = BasicConv2d(c7, (1, 1), name='branch7x7dbl_1')(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0),
                         name='branch7x7dbl_2')(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3),
                         name='branch7x7dbl_3')(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0),
                         name='branch7x7dbl_4')(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3),
                         name='branch7x7dbl_5')(bd)
        bp = avg_pool_3x3_cip_false(x)
        bp = BasicConv2d(192, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name='branch3x3_1')(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name='branch3x3_2')(b3)
        b7 = BasicConv2d(192, (1, 1), name='branch7x7x3_1')(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3),
                         name='branch7x7x3_2')(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0),
                         name='branch7x7x3_3')(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name='branch7x7x3_4')(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = 'avg'  # 'avg' (Mixed_7b) | 'max' (FID Mixed_7c)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name='branch1x1')(x)
        b3 = BasicConv2d(384, (1, 1), name='branch3x3_1')(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name='branch3x3_2a')(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name='branch3x3_2b')(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name='branch3x3dbl_1')(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1),
                         name='branch3x3dbl_2')(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1),
                          name='branch3x3dbl_3a')(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0),
                          name='branch3x3dbl_3b')(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_kind == 'avg':
            bp = avg_pool_3x3_cip_false(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=[(1, 1), (1, 1)])
        bp = BasicConv2d(192, (1, 1), name='branch_pool')(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Full FID network: [0,1] NHWC -> (pooled 2048-d features, 1008 logits)."""
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x, return_logits: bool = False):
        if self.resize_input:
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                                 'bilinear')
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name='Conv2d_1a_3x3')(x)
        x = BasicConv2d(32, (3, 3), name='Conv2d_2a_3x3')(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name='Conv2d_2b_3x3')(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name='Conv2d_3b_1x1')(x)
        x = BasicConv2d(192, (3, 3), name='Conv2d_4a_3x3')(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name='Mixed_5b')(x)
        x = InceptionA(64, name='Mixed_5c')(x)
        x = InceptionA(64, name='Mixed_5d')(x)
        x = InceptionB(name='Mixed_6a')(x)
        x = InceptionC(128, name='Mixed_6b')(x)
        x = InceptionC(160, name='Mixed_6c')(x)
        x = InceptionC(160, name='Mixed_6d')(x)
        x = InceptionC(192, name='Mixed_6e')(x)
        x = InceptionD(name='Mixed_7a')(x)
        x = InceptionE('avg', name='Mixed_7b')(x)
        x = InceptionE('max', name='Mixed_7c')(x)
        feats = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [B, 2048]
        if return_logits:
            logits = nn.Dense(1008, name='fc')(feats)
            return feats, logits
        return feats


def init_fid_inception(key, with_logits: bool = True):
    model = FIDInceptionV3()
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(key, x, return_logits=with_logits)
    return model, variables


def load_torch_fid_inception(variables: Dict, state_dict) -> Dict:
    """Map the pt_inception-2015-12-05 torch state_dict onto this module."""
    tree = jax.device_get(variables)
    params = tree['params']
    bstats = tree['batch_stats']

    def put(d, path, value):
        node = d
        for k in path[:-1]:
            node = node[k]
        assert node[path[-1]].shape == value.shape, \
            (path, node[path[-1]].shape, value.shape)
        node[path[-1]] = jnp.asarray(value)

    for tkey, tval in state_dict.items():
        tval = np.asarray(tval, np.float32)
        parts = tkey.split('.')
        if parts[0] == 'fc':
            if 'fc' not in params:
                continue
            if parts[1] == 'weight':
                put(params, ('fc', 'kernel'), np.transpose(tval))
            else:
                put(params, ('fc', 'bias'), tval)
            continue
        if parts[0].startswith('AuxLogits'):
            continue
        # e.g. Mixed_5b.branch1x1.conv.weight / .bn.running_mean
        *mods, layer, leaf = parts
        path = tuple(mods)
        if layer == 'conv':
            put(params, path + ('conv', 'kernel'),
                np.transpose(tval, (2, 3, 1, 0)))
        elif layer == 'bn':
            if leaf == 'weight':
                put(params, path + ('bn', 'scale'), tval)
            elif leaf == 'bias':
                put(params, path + ('bn', 'bias'), tval)
            elif leaf == 'running_mean':
                put(bstats, path + ('bn', 'mean'), tval)
            elif leaf == 'running_var':
                put(bstats, path + ('bn', 'var'), tval)
        else:
            raise KeyError(tkey)
    return {'params': params, 'batch_stats': bstats}
