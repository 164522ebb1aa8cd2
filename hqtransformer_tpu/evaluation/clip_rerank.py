"""TPU-native CLIP (ViT image encoder + text transformer) for re-ranking
txt2img candidates — the last capability of the reference demo notebook
(`/root/reference/scripts/sampling_demo.ipynb`, `clip_reranking` cell: CLIP
ViT-B/32 cosine similarity, candidates sorted descending).

The module mirrors OpenAI CLIP's architecture (QuickGELU MLPs, pre-LN
residual blocks, class token + learned positions, eot-position text
features) and `load_torch_clip` maps the official `clip` package state_dict
(ViT-B/32 et al.) into it; weights are an external asset, exactly as the
reference's `clip.load("ViT-B/32")` download is.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# CLIP preprocessing constants (clip.load's Compose: resize 224, center
# crop, normalize)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class CLIPConfig:
    image_resolution: int = 224
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    patch_size: int = 32
    embed_dim: int = 512
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8


VIT_B32 = CLIPConfig()


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResBlock(nn.Module):
    width: int
    heads: int
    causal: bool = False

    def setup(self):
        self.ln_1 = nn.LayerNorm(epsilon=1e-5, name='ln_1')
        self.ln_2 = nn.LayerNorm(epsilon=1e-5, name='ln_2')
        self.q = nn.Dense(self.width, name='q')
        self.k = nn.Dense(self.width, name='k')
        self.v = nn.Dense(self.width, name='v')
        self.out = nn.Dense(self.width, name='out')
        self.c_fc = nn.Dense(4 * self.width, name='c_fc')
        self.c_proj = nn.Dense(self.width, name='c_proj')

    def _attn(self, x):
        B, T, C = x.shape
        nh = self.heads
        hd = C // nh
        q = self.q(x).reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        k = self.k(x).reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        v = self.v(x).reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        att = jnp.einsum('bhqd,bhkd->bhqk', q, k) / math.sqrt(hd)
        if self.causal:
            mask = jnp.tril(jnp.ones((T, T), bool))
            att = jnp.where(mask[None, None], att, -1e10)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum('bhqk,bhkd->bhqd', att, v)
        return self.out(y.transpose(0, 2, 1, 3).reshape(B, T, C))

    def __call__(self, x):
        x = x + self._attn(self.ln_1(x))
        x = x + self.c_proj(quick_gelu(self.c_fc(self.ln_2(x))))
        return x


class CLIP(nn.Module):
    """Image + text encoders with a shared embedding space."""
    cfg: CLIPConfig = VIT_B32

    def setup(self):
        c = self.cfg
        n_patches = (c.image_resolution // c.patch_size) ** 2
        self.conv1 = nn.Conv(c.vision_width,
                             (c.patch_size, c.patch_size),
                             strides=(c.patch_size, c.patch_size),
                             use_bias=False, name='conv1')
        self.class_embedding = self.param(
            'class_embedding', nn.initializers.normal(0.02),
            (c.vision_width,))
        self.vis_pos = self.param(
            'vis_pos', nn.initializers.normal(0.02),
            (n_patches + 1, c.vision_width))
        self.ln_pre = nn.LayerNorm(epsilon=1e-5, name='ln_pre')
        self.vis_blocks = [
            ResBlock(c.vision_width, c.vision_heads, name=f'vis_{i}')
            for i in range(c.vision_layers)]
        self.ln_post = nn.LayerNorm(epsilon=1e-5, name='ln_post')
        self.vis_proj = self.param(
            'vis_proj', nn.initializers.normal(0.02),
            (c.vision_width, c.embed_dim))

        self.token_embedding = nn.Embed(c.vocab_size, c.text_width,
                                        name='token_embedding')
        self.txt_pos = self.param(
            'txt_pos', nn.initializers.normal(0.01),
            (c.context_length, c.text_width))
        self.txt_blocks = [
            ResBlock(c.text_width, c.text_heads, causal=True,
                     name=f'txt_{i}') for i in range(c.text_layers)]
        self.ln_final = nn.LayerNorm(epsilon=1e-5, name='ln_final')
        self.text_projection = self.param(
            'text_projection', nn.initializers.normal(0.01),
            (c.text_width, c.embed_dim))
        self.logit_scale = self.param(
            'logit_scale', nn.initializers.constant(np.log(1 / 0.07)), ())

    def encode_image(self, images: jax.Array) -> jax.Array:
        """images: [B, H, W, 3] CLIP-normalized. -> [B, embed_dim]."""
        x = self.conv1(images)
        B, hp, wp, C = x.shape
        x = x.reshape(B, hp * wp, C)
        cls = jnp.tile(self.class_embedding[None, None, :], (B, 1, 1))
        x = jnp.concatenate([cls, x], axis=1) + self.vis_pos[None]
        x = self.ln_pre(x)
        for blk in self.vis_blocks:
            x = blk(x)
        return self.ln_post(x[:, 0, :]) @ self.vis_proj

    def encode_text(self, tokens: jax.Array) -> jax.Array:
        """tokens: [B, context_length] int. -> [B, embed_dim] (features at
        the argmax (eot) token position, as OpenAI CLIP)."""
        x = self.token_embedding(tokens) + self.txt_pos[None]
        for blk in self.txt_blocks:
            x = blk(x)
        x = self.ln_final(x)
        eot = jnp.argmax(tokens, axis=-1)
        x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0, :]
        return x @ self.text_projection

    def __call__(self, images, tokens):
        return self.encode_image(images), self.encode_text(tokens)


def preprocess(pixels: np.ndarray, resolution: int = 224) -> np.ndarray:
    """[B, H, W, 3] floats in [0, 1] -> CLIP-normalized [B, R, R, 3]
    (bilinear resize of the already-square sample + normalize; the demo's
    samples are square so resize==resize-then-center-crop)."""
    x = jnp.asarray(pixels, jnp.float32)
    x = jax.image.resize(x, (x.shape[0], resolution, resolution, 3),
                         method='bilinear')
    return np.asarray((x - CLIP_MEAN) / CLIP_STD)


def clip_scores(clip_model: CLIP, variables, pixels: np.ndarray,
                tokens: np.ndarray) -> np.ndarray:
    """Cosine similarity of each image against the (single) prompt."""
    imgs = preprocess(pixels, clip_model.cfg.image_resolution)
    img_f = clip_model.apply(variables, jnp.asarray(imgs),
                             method=CLIP.encode_image)
    txt_f = clip_model.apply(variables, jnp.asarray(tokens),
                             method=CLIP.encode_text)
    img_f = img_f / jnp.linalg.norm(img_f, axis=-1, keepdims=True)
    txt_f = txt_f / jnp.linalg.norm(txt_f, axis=-1, keepdims=True)
    return np.asarray(jnp.sum(img_f * txt_f[:1], axis=-1))


def clip_rerank(clip_model: CLIP, variables, pixels: np.ndarray,
                tokens: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(ranked indices best-first, their scores) — the notebook's
    `clip_reranking` semantics."""
    scores = clip_scores(clip_model, variables, pixels, tokens)
    ranked = np.argsort(scores)[::-1]
    return ranked, scores[ranked]


# ------------------------------------------------------------ torch import

def load_torch_clip(variables: Dict, state_dict: Dict) -> Dict:
    """Map the official `clip` package state_dict (e.g. ViT-B/32) into the
    flax variable tree. Tensors arrive as torch tensors or numpy arrays."""
    import numpy as np

    def g(name):
        t = state_dict[name]
        arr = t.detach().cpu().float().numpy() if hasattr(t, 'detach') \
            else np.asarray(t, np.float32)
        return arr

    p = jax.tree.map(lambda x: x, variables['params'])  # mutable copy

    p['conv1']['kernel'] = g('visual.conv1.weight').transpose(2, 3, 1, 0)
    p['class_embedding'] = g('visual.class_embedding')
    p['vis_pos'] = g('visual.positional_embedding')
    p['ln_pre']['scale'] = g('visual.ln_pre.weight')
    p['ln_pre']['bias'] = g('visual.ln_pre.bias')
    p['ln_post']['scale'] = g('visual.ln_post.weight')
    p['ln_post']['bias'] = g('visual.ln_post.bias')
    p['vis_proj'] = g('visual.proj')

    p['token_embedding']['embedding'] = g('token_embedding.weight')
    p['txt_pos'] = g('positional_embedding')
    p['ln_final']['scale'] = g('ln_final.weight')
    p['ln_final']['bias'] = g('ln_final.bias')
    p['text_projection'] = g('text_projection')
    p['logit_scale'] = g('logit_scale').reshape(())

    def block(dst, prefix):
        W = g(f'{prefix}.attn.in_proj_weight')
        bqkv = g(f'{prefix}.attn.in_proj_bias')
        C = W.shape[1]
        for i, nm in enumerate(('q', 'k', 'v')):
            dst[nm]['kernel'] = W[i * C:(i + 1) * C].T
            dst[nm]['bias'] = bqkv[i * C:(i + 1) * C]
        dst['out']['kernel'] = g(f'{prefix}.attn.out_proj.weight').T
        dst['out']['bias'] = g(f'{prefix}.attn.out_proj.bias')
        dst['ln_1']['scale'] = g(f'{prefix}.ln_1.weight')
        dst['ln_1']['bias'] = g(f'{prefix}.ln_1.bias')
        dst['ln_2']['scale'] = g(f'{prefix}.ln_2.weight')
        dst['ln_2']['bias'] = g(f'{prefix}.ln_2.bias')
        dst['c_fc']['kernel'] = g(f'{prefix}.mlp.c_fc.weight').T
        dst['c_fc']['bias'] = g(f'{prefix}.mlp.c_fc.bias')
        dst['c_proj']['kernel'] = g(f'{prefix}.mlp.c_proj.weight').T
        dst['c_proj']['bias'] = g(f'{prefix}.mlp.c_proj.bias')

    i = 0
    while f'visual.transformer.resblocks.{i}.ln_1.weight' in state_dict:
        block(p[f'vis_{i}'], f'visual.transformer.resblocks.{i}')
        i += 1
    i = 0
    while f'transformer.resblocks.{i}.ln_1.weight' in state_dict:
        block(p[f'txt_{i}'], f'transformer.resblocks.{i}')
        i += 1

    return {'params': jax.tree.map(jnp.asarray, p)}
