#!/usr/bin/env python
"""End-to-end smoke demo: build the two-stage model from a config, sample
class-conditional images through the jitted lax.scan sampler + stage-1
decoder, and save a PNG grid.

With --tiny, shrinks the model so the whole thing runs in seconds on CPU;
without it, uses the flagship config as-is (random weights — released
reference checkpoints load via TwoStageModel.load_reference_checkpoint).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.twostage import TwoStageModel
from hqtransformer_tpu.sampling.engine import SamplingParams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default=os.path.join(
        os.path.dirname(__file__), '..', 'configs', 'imagenet', 'stage2',
        'hqtransformer-l12-top8x8.yaml'))
    ap.add_argument('--tiny', action='store_true')
    ap.add_argument('--code-level', type=int, default=2, choices=[2, 3])
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--cls', type=int, default=207)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--top-k', type=int, default=2048)
    ap.add_argument('--temperature', type=float, default=0.95)
    ap.add_argument('--out', default='/tmp/hqtpu_demo.png')
    args = ap.parse_args()

    cfg = build_twostage_config(args.config)
    if args.code_level == 3:
        cfg.stage1.type = 'hqvae'
        cfg.stage1.hparams_aux.code_levels = 3
        cfg.stage1.n_embed_levels = [cfg.stage1.n_embed] * 3
        cfg.stage2.type = 'multilevel-hq'
        cfg.stage2.decoding_type = 'parallel-add'
        cfg.stage2.vocab_sizes_img = [cfg.stage1.n_embed] * 3
        # 3-level pyramid needs one less conv downsample for the same
        # top resolution (reference level-3 configs use ch_mult [1,2,4])
        cfg.stage1.hparams.ch_mult = cfg.stage1.hparams.ch_mult[:-1]
        cfg.stage1.hparams.attn_resolutions = [
            cfg.stage1.hparams.attn_resolutions[0] * 2]
    if args.tiny:
        cfg.dataset.image_resolution = 64
        cfg.stage1.hparams.resolution = 64
        cfg.stage1.hparams.ch = 32
        cfg.stage1.hparams.ch_mult = [1, 2]
        cfg.stage1.hparams.z_channels = 64
        cfg.stage1.hparams.attn_resolutions = [16]
        cfg.stage1.embed_dim = 64
        cfg.stage1.n_embed = 512
        cfg.stage1.n_embed_levels = [512] * 3
        cfg.stage2.vocab_size_img = 512
        cfg.stage2.vocab_sizes_img = [512] * 3
        cfg.stage2.hparams.embed_dim = 128
        cfg.stage2.hparams.n_layers = 2
        cfg.stage2.hparams.n_heads = 4
        cfg.stage2.hparams.ctx_len_img = 64
        args.top_k = min(args.top_k, 256)

    model = TwoStageModel(cfg)
    print(f'devices: {jax.devices()}')
    t0 = time.time()
    variables = model.init_variables(jax.random.PRNGKey(args.seed))
    n1 = sum(x.size for x in jax.tree.leaves(variables['stage1']))
    n2 = sum(x.size for x in jax.tree.leaves(variables['stage2']))
    print(f'init {time.time() - t0:.1f}s | stage1 {n1/1e6:.1f}M '
          f'stage2 {n2/1e6:.1f}M params')

    if args.code_level == 3:
        sampler = model.make_pixel_sampler_multilevel(
            top_k=(args.top_k,) * 3, temperature=(args.temperature,) * 3)
    else:
        sp = SamplingParams(top_k_top=args.top_k, top_k_bot=args.top_k,
                            top_p_top=None, top_p_bot=None,
                            temperature_top=args.temperature,
                            temperature_bot=args.temperature)
        sampler = model.make_pixel_sampler(params=sp)
    labels = jnp.full((args.batch,), args.cls, jnp.int32)

    t0 = time.time()
    pixels, codes = sampler(variables, jax.random.PRNGKey(args.seed + 1),
                            labels)
    pixels.block_until_ready()
    print(f'compile+first sample: {time.time() - t0:.1f}s')

    t0 = time.time()
    pixels, codes = sampler(variables, jax.random.PRNGKey(args.seed + 2),
                            labels)
    pixels.block_until_ready()
    dt = time.time() - t0
    print(f'sample: {dt:.3f}s ({args.batch / dt:.2f} samples/s) '
          f'pixels {pixels.shape} codes ' +
          ' '.join(str(c.shape) for c in codes))
    assert np.isfinite(np.asarray(pixels)).all(), 'non-finite pixels'
    assert (np.asarray(pixels) >= 0).all() and (np.asarray(pixels) <= 1).all()

    # save grid
    try:
        from PIL import Image
        arr = (np.asarray(pixels) * 255).astype(np.uint8)
        B, H, W, C = arr.shape
        grid = arr.reshape(1, B, H, W, C).transpose(0, 2, 1, 3, 4) \
            .reshape(H, B * W, C)
        Image.fromarray(grid).save(args.out)
        print(f'saved {args.out}')
    except ImportError:
        pass
    print('OK')


if __name__ == '__main__':
    main()
