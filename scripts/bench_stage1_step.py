#!/usr/bin/env python
"""Time the jitted stage-1 GAN train step in isolation (no data loader, no
validation): the number behind README's stage-1 img/s, and the A/B harness
for the Pallas VQ kernel (HQT_DISABLE_PALLAS_VQ=1 to compare).

Usage: python scripts/bench_stage1_step.py [--batch 16] [--lpips] [--fast]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import build_stage1_config
from hqtransformer_tpu.models.stage1.generator import build_generator
from hqtransformer_tpu.models.stage1.lpips import LPIPS
from hqtransformer_tpu.train.scheduler import build_schedule_from_config
from hqtransformer_tpu.train.stage1 import (Stage1State, make_discriminator,
                                            make_stage1_optimizer,
                                            make_stage1_train_step)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default=os.path.join(
        os.path.dirname(__file__), '..', 'configs', 'imagenet', 'stage1',
        'hqvae-pixelshuffle-top8x8.yaml'))
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--steps', type=int, default=20)
    ap.add_argument('--lpips', action='store_true',
                    help='include LPIPS (random weights; cost is identical)')
    ap.add_argument('--fast', action='store_true', help='--fast-gan-step')
    ap.add_argument('--bf16', action='store_true',
                    help='bf16 activations / f32 params+losses '
                         '(main_stage1.py --bf16)')
    ap.add_argument('--perf-row', action='store_true',
                    help='merge the result into PERF.json as the '
                         "'stage1-train' row (training throughput on the "
                         'real chip — the reference trains stage-1 as its '
                         'main workload, main_stage1.py:99-112)')
    args = ap.parse_args()

    cfg = build_stage1_config(args.config)
    res = cfg.dataset.image_resolution
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    generator = build_generator(cfg.stage1, dtype=dtype, ema_axis_name=None)
    discriminator = make_discriminator(cfg.stage1.hparams_disc, dtype=dtype)

    key = jax.random.PRNGKey(0)
    k1, k2, key = jax.random.split(key, 3)
    x_init = jnp.zeros((1, res, res, 3), jnp.float32)
    gvars = generator.init(k1, x_init)
    dvars = discriminator.init(k2, x_init)

    lpips = lpips_vars = None
    if args.lpips:
        lpips = LPIPS(dtype=dtype)
        lpips_vars = lpips.init(jax.random.PRNGKey(3), x_init, x_init)

    schedule = build_schedule_from_config(cfg.optimizer, 100, 10000,
                                          world_size=1)
    g_opt = make_stage1_optimizer(cfg.optimizer, schedule)
    d_opt = make_stage1_optimizer(cfg.optimizer, schedule)
    hd = cfg.stage1.hparams_disc
    step_fn = make_stage1_train_step(
        generator, discriminator, lpips, g_opt, d_opt, hd,
        bottom_start=None,
        residual_l1_weight=hd.residual_l1_weight or 0.0,
        perceptual_weight=1.0 if args.lpips else 0.0,
        faithful_double_forward=not args.fast)
    state = Stage1State(jnp.zeros((), jnp.int32), gvars['params'],
                        gvars['ema'], dvars['params'],
                        g_opt.init(gvars['params']),
                        d_opt.init(dvars['params']))
    jit_step = jax.jit(step_fn)

    x = jax.random.uniform(jax.random.PRNGKey(4),
                           (args.batch, res, res, 3), jnp.float32) * 2 - 1
    key, k = jax.random.split(key)
    state, metrics = jit_step(state, lpips_vars, x, k)
    jax.block_until_ready(jax.tree.leaves(metrics))
    float(metrics['total_loss'])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        key, k = jax.random.split(key)
        state, metrics = jit_step(state, lpips_vars, x, k)
    jax.block_until_ready(jax.tree.leaves(state.gen_params)[0])
    float(metrics['total_loss'])
    dt = (time.perf_counter() - t0) / args.steps
    print(f'stage-1 step: {dt * 1000:.1f} ms  '
          f'({args.batch / dt:.1f} img/s/chip)  '
          f'lpips={args.lpips} fast={args.fast} bf16={args.bf16} '
          f'pallas_vq={os.environ.get("HQT_DISABLE_PALLAS_VQ") != "1"}')

    if args.perf_row:
        import json
        out_path = os.path.join(os.path.dirname(__file__), '..',
                                'PERF.json')
        merged = {}
        if os.path.exists(out_path):
            try:
                doc = json.load(open(out_path))
                for r in doc['rows']:
                    merged[r['model']] = r
            except Exception:
                doc = {}
        row = {'model': 'stage1-train',
               'config': os.path.relpath(args.config, os.path.join(
                   os.path.dirname(__file__), '..')),
               'batch': args.batch,
               'ms_per_step': round(dt * 1000, 1),
               'img_per_sec': round(args.batch / dt, 1),
               'lpips': args.lpips, 'fast_gan_step': args.fast,
               'bf16': args.bf16}
        merged[row['model']] = row
        doc = json.load(open(out_path)) if os.path.exists(out_path) else {
            'protocol': '', 'device': '', 'rows': []}
        doc['rows'] = list(merged.values())
        with open(out_path, 'w') as f:
            json.dump(doc, f, indent=1)
            f.write('\n')
        print(f'merged stage1-train row into {out_path}')


if __name__ == '__main__':
    main()
