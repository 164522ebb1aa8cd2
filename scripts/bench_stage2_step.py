#!/usr/bin/env python
"""Time the jitted stage-2 train step in isolation (frozen stage-1 code
extraction + weighted hierarchical CE + AdamW): the number behind README's
stage-2 img/s table.

Usage: python scripts/bench_stage2_step.py [--batch 8] [--bf16] [--accum N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.twostage import TwoStageModel
from hqtransformer_tpu.train.scheduler import build_schedule_from_config
from hqtransformer_tpu.train.stage2 import (TrainState, make_optimizer,
                                            make_train_step)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default=os.path.join(
        os.path.dirname(__file__), '..', 'configs', 'imagenet', 'stage2',
        'hqtransformer-l12-top8x8.yaml'))
    ap.add_argument('--batch', type=int, default=8,
                    help='per-step (micro) batch size')
    ap.add_argument('--steps', type=int, default=20)
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--accum', type=int, default=1,
                    help='gradient-accumulation steps (optax.MultiSteps)')
    args = ap.parse_args()

    cfg = build_twostage_config(args.config)
    res = cfg.dataset.image_resolution
    model = TwoStageModel(cfg, dtype=jnp.bfloat16 if args.bf16
                          else jnp.float32)
    variables = model.init_variables(jax.random.PRNGKey(0))

    schedule = build_schedule_from_config(cfg.optimizer, 100, 10000,
                                          world_size=1)
    opt = make_optimizer(cfg.optimizer, schedule, args.accum)
    step_fn = make_train_step(
        model.stage2, model.stage1, opt,
        weight_bottom=cfg.stage2.weight_bottom or 4.0,
        use_cond=bool(cfg.stage2.use_cls_cond))
    params = variables['stage2']['params']
    state = TrainState(jnp.zeros((), jnp.int32), params, opt.init(params))
    stage1_vars = variables['stage1']
    jit_step = jax.jit(step_fn, donate_argnums=(0,))

    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (args.batch, res, res, 3), jnp.float32) * 2 - 1
    labels = jnp.zeros((args.batch,), jnp.int32)
    state, metrics = jit_step(state, stage1_vars, x, labels)
    jax.block_until_ready(jax.tree.leaves(metrics))
    float(metrics['loss'])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = jit_step(state, stage1_vars, x, labels)
    jax.block_until_ready(jax.tree.leaves(state.params)[0])
    float(metrics['loss'])
    dt = (time.perf_counter() - t0) / args.steps
    print(f'stage-2 step: {dt * 1000:.1f} ms  '
          f'({args.batch / dt:.1f} img/s/chip)  '
          f'batch={args.batch} bf16={args.bf16} accum={args.accum}')


if __name__ == '__main__':
    main()
