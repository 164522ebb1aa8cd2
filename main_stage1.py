#!/usr/bin/env python
"""Stage-1 HQ-VAE training CLI — the `main_stage1.py` surface of the
reference, TPU-native.

Replaces Lightning DDP-over-NCCL (`/root/reference/main_stage1.py:60-112`)
with one jit-compiled train step data-parallel over a `jax.sharding.Mesh`:
gradients and EMA codebook statistics reduce over the 'dp' axis inside XLA.
Checkpoints via Orbax; scalars/image grids via TensorBoard.

  python main_stage1.py -c configs/imagenet/stage1/hqvae-top8x8.yaml \
      -r results/ --data-root /data/imagenet [--max-steps N] [--eval]
"""

import argparse
import os
import sys
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from hqtransformer_tpu.config import build_stage1_config
from hqtransformer_tpu.checkpoint import save_checkpoint
from hqtransformer_tpu.data.datasets import (DataLoader, LoaderConfig,
                                             PrefetchLoader,
                                             build_dataset)
from hqtransformer_tpu.models.stage1.generator import build_generator
from hqtransformer_tpu.models.stage1.lpips import (LPIPS, load_torch_lpips_lins,
                                                   load_torch_vgg16)
from hqtransformer_tpu.parallel.mesh import (global_batch, make_mesh,
                                             replicated)
from hqtransformer_tpu.train.scheduler import build_schedule_from_config
from hqtransformer_tpu.train.stage1 import (Stage1State, make_discriminator,
                                            make_stage1_optimizer,
                                            make_stage1_train_step)
from hqtransformer_tpu.utils.logging import RunLogger


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument('-c', '--config-path', type=str, required=True)
    ap.add_argument('-r', '--result-path', type=str, default='./results')
    ap.add_argument('--data-root', type=str, required=True)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--multihost', action='store_true',
                    help='call jax.distributed.initialize() (TPU '
                         'pods / multi-process CPU); each process '
                         'then loads only its local batch slice')
    ap.add_argument('--max-steps', type=int, default=None,
                    help='override total optimizer steps (smoke runs)')
    ap.add_argument('--eval', action='store_true')
    ap.add_argument('--resume', type=str, default=None,
                    help='orbax checkpoint dir to resume from '
                         '(the reference parses --resume but ignores it, '
                         'main_stage1.py:37; here it works)')
    ap.add_argument('--lpips-vgg', type=str, default=None,
                    help='torchvision vgg16 state_dict (.pth) for LPIPS')
    ap.add_argument('--lpips-lins', type=str, default=None,
                    help='LPIPS linear-head weights (.pth)')
    ap.add_argument('--fast-gan-step', action='store_true',
                    help='reuse the generator-phase recon for the disc step '
                         '(halves cost; reference runs two forwards)')
    ap.add_argument('--bf16', action='store_true',
                    help='bf16 activations with f32 params, losses and '
                         'quantizer statistics in f32 (the TPU analogue of '
                         'the reference\'s fp16 autocast)')
    return ap.parse_args()


def main():
    args = parse_args()
    if args.multihost:
        jax.distributed.initialize()
    cfg = build_stage1_config(args.config_path)
    now = datetime.now().strftime('%d%m%Y_%H%M%S')
    run_dir = os.path.join(args.result_path,
                           os.path.basename(args.config_path).split('.')[0],
                           now)
    logger = RunLogger(run_dir, cfg,
                       img_logging_freq=cfg.experiment.img_logging_freq)
    logger.line(f'devices: {jax.devices()}')

    # ------------------------------------------------------------- data
    res = cfg.dataset.image_resolution
    n_dev = jax.device_count()
    local_bs = cfg.experiment.local_batch_size
    global_bs = local_bs * n_dev
    train_ds = build_dataset(cfg.dataset.dataset or 'imagenet',
                             args.data_root, 'train')
    valid_ds = build_dataset(cfg.dataset.dataset or 'imagenet',
                             args.data_root, 'val')
    steps_per_epoch = max(1, len(train_ds) // global_bs)
    total_steps = args.max_steps or steps_per_epoch * cfg.experiment.epochs
    grad_accm = max(1, cfg.experiment.total_batch_size // global_bs)
    if grad_accm > 1:
        logger.line(f'gradient accumulation x{grad_accm} '
                    f'(effective batch {global_bs * grad_accm})')
    logger.line(f'{len(train_ds)} train images, {steps_per_epoch} steps/'
                f'epoch, {total_steps} total steps, global batch {global_bs}')

    # ------------------------------------------------------------ model
    mesh = make_mesh(dp=n_dev, tp=1)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    generator = build_generator(cfg.stage1, dtype=dtype, ema_axis_name=None)
    hd = cfg.stage1.hparams_disc
    discriminator = make_discriminator(hd, dtype=dtype)

    key = jax.random.PRNGKey(args.seed)
    k1, k2, key = jax.random.split(key, 3)
    x_init = jnp.zeros((1, res, res, 3), jnp.float32)
    gvars = generator.init(k1, x_init)
    dvars = discriminator.init(k2, x_init)

    lpips = None
    lpips_vars = None
    perceptual_weight = 1.0
    if args.lpips_vgg:
        import torch
        lpips = LPIPS(dtype=dtype)
        lpips_vars = lpips.init(jax.random.PRNGKey(0), x_init, x_init)
        lpips_vars = load_torch_vgg16(
            lpips_vars, torch.load(args.lpips_vgg, map_location='cpu'))
        if args.lpips_lins:
            lpips_vars = load_torch_lpips_lins(
                lpips_vars, torch.load(args.lpips_lins, map_location='cpu'))
        logger.line('LPIPS weights loaded')
    else:
        perceptual_weight = 0.0
        logger.line('WARNING: no --lpips-vgg given; perceptual loss '
                    'DISABLED (reference uses pretrained VGG16 LPIPS)')

    schedule = build_schedule_from_config(cfg.optimizer, steps_per_epoch,
                                          total_steps, world_size=n_dev)
    g_opt = make_stage1_optimizer(cfg.optimizer, schedule, grad_accm)
    d_opt = make_stage1_optimizer(cfg.optimizer, schedule, grad_accm)
    state = Stage1State(jnp.zeros((), jnp.int32), gvars['params'],
                        gvars['ema'], dvars['params'],
                        g_opt.init(gvars['params']),
                        d_opt.init(dvars['params']))

    start_step = 0
    if args.resume:
        from hqtransformer_tpu.checkpoint import (latest_step,
                                                  restore_checkpoint)
        resume_step = latest_step(args.resume)
        restored = restore_checkpoint(args.resume, step=resume_step,
                                      template=state._asdict())
        state = Stage1State(**restored)
        # continue the TRUE step count (labels, ckpt dir names, the
        # total_steps bound, per-epoch loader seeding)
        start_step = resume_step
        logger.line(f'resumed from {args.resume} @ step {resume_step}')

    train_step = make_stage1_train_step(
        generator, discriminator, lpips, g_opt, d_opt, hd,
        bottom_start=None,
        residual_l1_weight=hd.residual_l1_weight or 0.0,
        perceptual_weight=perceptual_weight,
        faithful_double_forward=not args.fast_gan_step)
    # NOTE: no donation — deduped zero-scalars (step counter, optax counts)
    # alias buffers and XLA rejects double donation
    jit_step = jax.jit(train_step)

    # replicate state, shard batches over dp
    state = jax.device_put(state, replicated(mesh))
    if lpips_vars is not None:
        lpips_vars = jax.device_put(lpips_vars, replicated(mesh))

    # validation + image logging (`vqgan.py:88-99`, `logger.py:49-73`)
    @jax.jit
    def eval_recon(state, x):
        variables = {'params': state.gen_params, 'ema': state.ema}
        dec, diffs, codes = generator.apply(variables, x)
        rec = jnp.mean(jnp.square(x - dec))
        return rec, jnp.clip(dec * 0.5 + 0.5, 0, 1)

    def run_validation(state, step, max_batches=8):
        vcfg = LoaderConfig(batch_size=min(cfg.experiment.valid_batch_size,
                                           max(1, len(valid_ds))),
                            resolution=res,
                            dataset_name=cfg.dataset.dataset or 'imagenet',
                            train=False)
        recs, first = [], None
        for bi, (x_np, _) in enumerate(DataLoader(valid_ds, vcfg)):
            rec, dec01 = eval_recon(state, jnp.asarray(x_np))
            recs.append(float(rec))
            if first is None:
                first = (np.asarray(x_np) * 0.5 + 0.5, np.asarray(dec01))
            if bi + 1 >= max_batches:
                break
        if recs:
            logger.line(f'valid/rec_loss {np.mean(recs):.5f} @ step {step}')
            logger.scalars({'rec_loss': float(np.mean(recs))}, step, 'valid')
        if first is not None:
            logger.images('valid/input', first[0], step)
            logger.images('valid/recon', first[1], step)

    # ------------------------------------------------------------- loop
    # each process loads only its host-local slice of the global batch
    host_bs = local_bs * jax.local_device_count()
    loader_cfg = LoaderConfig(batch_size=host_bs, resolution=res,
                              dataset_name=cfg.dataset.dataset or 'imagenet',
                              train=True, seed=args.seed,
                              shard_index=jax.process_index(),
                              shard_count=jax.process_count())
    assert len(train_ds) >= global_bs, (
        f'dataset ({len(train_ds)} images) smaller than one global batch '
        f'({global_bs}); reduce local_batch_size')
    step = start_step
    t0 = time.time()
    # a mid-epoch resume fast-forwards the first epoch's loader past the
    # already-consumed batches (per-epoch seed makes the order deterministic,
    # so the resumed run sees the exact data order of an uninterrupted one)
    skip = start_step % steps_per_epoch
    if skip:
        logger.line(f'resume mid-epoch: skipping {skip} consumed batches')
    for epoch in range(start_step // steps_per_epoch, 10 ** 9):
        if step >= total_steps:
            break
        loader_cfg.seed = args.seed + epoch
        for x_np, _ in PrefetchLoader(DataLoader(train_ds,
                                                 loader_cfg)):
            if skip:
                skip -= 1
                continue
            x = global_batch(mesh, x_np)
            key, k = jax.random.split(key)
            state, metrics = jit_step(state, lpips_vars, x, k)
            step += 1
            if step % 50 == 0 or step == start_step + 1:
                m = {k2: float(v) for k2, v in metrics.items()}
                dt = (time.time() - t0) / (step - start_step)
                logger.line(f'step {step}/{total_steps} '
                            f'({global_bs / dt:.1f} img/s) ' +
                            ' '.join(f'{k2}={v:.4f}'
                                     for k2, v in sorted(m.items())))
                logger.scalars(m, step)
            if step >= total_steps:
                break
        if step >= total_steps:
            break
        if (epoch + 1) % cfg.experiment.test_freq == 0:
            run_validation(state, step)
        if (epoch + 1) % cfg.experiment.save_ckpt_freq == 0:
            save_checkpoint(os.path.join(run_dir, 'ckpt'),
                            jax.device_get(state._asdict()), step)
            logger.line(f'checkpoint saved @ step {step}')

    run_validation(state, step)
    save_checkpoint(os.path.join(run_dir, 'ckpt'),
                    jax.device_get(state._asdict()), step)
    logger.line(f'final checkpoint saved @ step {step}')
    logger.close()


if __name__ == '__main__':
    main()
