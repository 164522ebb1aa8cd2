"""LPIPS perceptual loss: VGG16 feature stack + learned linear heads.

TPU re-design of the reference's stripped PerceptualSimilarity port
(`hqvae/models/stage1/modules/lpips.py:11-113`): the frozen VGG16 runs in
NHWC, features are channel-unit-normalized, squared differences pass through
1x1 'lin' heads and are spatially averaged, summed over the 5 tap points
(relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).

Weights are NOT bundled (the reference hardcodes a private path,
`lpips.py:12`, and downloads torchvision VGG16). `load_torch_vgg16` /
`load_torch_lpips_lins` map the standard torchvision `features.*` and
taming-transformers `lin*.model.1.weight` layouts onto this module when the
user provides the files; without them the loss must be disabled
(perceptual_weight=0) — random-init VGG is not a perceptual metric.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision VGG16 'features' conv layout: (sequential index, out_channels)
VGG16_CONVS = [(0, 64), (2, 64), (5, 128), (7, 128), (10, 256), (12, 256),
               (14, 256), (17, 512), (19, 512), (21, 512), (24, 512),
               (26, 512), (28, 512)]
# slice boundaries after which features are tapped (relu indices 3, 8, 15,
# 22, 29 in the Sequential — i.e. after convs 1, 3, 6, 9, 12)
TAP_AFTER_CONV = [1, 3, 6, 9, 12]
LPIPS_CHNS = [64, 128, 256, 512, 512]


class VGG16Features(nn.Module):
    """VGG16 feature extractor returning the 5 LPIPS tap activations
    (torchvision layout; `lpips.py:116-147` in the reference)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        taps = []
        conv_idx = 0
        pool_before = {5, 10, 17, 24}  # convs preceded by a maxpool
        for seq_idx, out_ch in VGG16_CONVS:
            if seq_idx in pool_before:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(out_ch, (3, 3), padding=[(1, 1)] * 2,
                        name=f'conv_{seq_idx}', dtype=self.dtype)(x)
            x = nn.relu(x)
            if conv_idx in TAP_AFTER_CONV:
                taps.append(x)
            conv_idx += 1
        return taps


def normalize_tensor(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Unit-normalize along channels (`lpips.py` normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Full LPIPS distance (`lpips.py:11-56`). Input NHWC in [-1, 1]."""
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # ImageNet scaling layer constants (`lpips.py` ScalingLayer)
        self.shift = jnp.asarray([-.030, -.088, -.188], jnp.float32)
        self.scale = jnp.asarray([.458, .448, .450], jnp.float32)
        self.net = VGG16Features(name='net', dtype=self.dtype)
        self.lins = [nn.Conv(1, (1, 1), use_bias=False, name=f'lin{i}',
                             dtype=self.dtype)
                     for i in range(len(LPIPS_CHNS))]

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        x = (x - self.shift) / self.scale
        y = (y - self.shift) / self.scale
        fx = self.net(x)
        fy = self.net(y)
        val = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            diff = jnp.square(normalize_tensor(a) - normalize_tensor(b))
            val = val + jnp.mean(self.lins[i](diff), axis=(1, 2))
        return val.mean()


def init_lpips(key, resolution: int = 64):
    model = LPIPS()
    x = jnp.zeros((1, resolution, resolution, 3))
    return model, model.init(key, x, x)


def load_torch_vgg16(variables: Dict, vgg_state_dict) -> Dict:
    """Copy torchvision vgg16 'features.N.weight/bias' tensors into the
    VGG16Features params."""
    params = jax.device_get(variables)['params']
    for seq_idx, _ in VGG16_CONVS:
        w = np.asarray(vgg_state_dict[f'features.{seq_idx}.weight'])
        b = np.asarray(vgg_state_dict[f'features.{seq_idx}.bias'])
        leaf = params['net'][f'conv_{seq_idx}']
        leaf['kernel'] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
        leaf['bias'] = jnp.asarray(b)
    return {'params': params}


def load_reference_lpips(variables: Dict, state_dict) -> Dict:
    """Copy a FULL reference `LPIPS.state_dict()` — the sliced-VGG layout
    `net.slice{1..5}.{seq}.weight/bias` (`lpips.py:67-86`) plus
    `lin{i}.model.1.weight` heads — into this module's params."""
    params = jax.device_get(variables)['params']
    slice_of_seq = {}
    for s, (lo, hi) in enumerate([(0, 4), (4, 9), (9, 16), (16, 23),
                                  (23, 30)], start=1):
        for seq in range(lo, hi):
            slice_of_seq[seq] = s
    for seq_idx, _ in VGG16_CONVS:
        s = slice_of_seq[seq_idx]
        w = np.asarray(state_dict[f'net.slice{s}.{seq_idx}.weight'])
        b = np.asarray(state_dict[f'net.slice{s}.{seq_idx}.bias'])
        leaf = params['net'][f'conv_{seq_idx}']
        leaf['kernel'] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
        leaf['bias'] = jnp.asarray(b)
    for i in range(len(LPIPS_CHNS)):
        w = np.asarray(state_dict[f'lin{i}.model.1.weight'])
        params[f'lin{i}']['kernel'] = jnp.asarray(
            np.transpose(w, (2, 3, 1, 0)))
    return {'params': params}


def load_torch_lpips_lins(variables: Dict, lpips_state_dict) -> Dict:
    """Copy taming/PerceptualSimilarity 'lin{i}.model.1.weight' 1x1 convs."""
    params = jax.device_get(variables)['params']
    for i in range(len(LPIPS_CHNS)):
        key = f'lin{i}.model.1.weight'
        if key not in lpips_state_dict:
            key = f'lins.{i}.model.1.weight'
        w = np.asarray(lpips_state_dict[key])  # [1, C, 1, 1]
        params[f'lin{i}']['kernel'] = jnp.asarray(
            np.transpose(w, (2, 3, 1, 0)))
    return {'params': params}
