#!/usr/bin/env python
"""Stage-2 HQ-Transformer training CLI.

The reference ships the `ImageGPT2` training module but deliberately not the
launch script (`/root/reference/configs/README.md:27`); this provides the
full capability: frozen stage-1 code extraction, weighted hierarchical CE
(optionally soft-target), AdamW with the minDALL-E decay split, warmup-cosine
LR, data/tensor-parallel sharding over a `jax.sharding.Mesh`.

  python main_stage2.py -c configs/imagenet/stage2/hqtransformer-l12-top8x8.yaml \
      -r results/ --data-root /data/imagenet --stage1-ckpt <ckpt> [--tp 1]
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

from hqtransformer_tpu.checkpoint import (convert_torch_state_dict,
                                          load_torch_checkpoint,
                                          save_checkpoint)
from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.data.datasets import (DataLoader, LoaderConfig,
                                             PrefetchLoader,
                                             build_dataset)
from hqtransformer_tpu.data.tokenizers import create_tokenizer
from hqtransformer_tpu.models.twostage import TwoStageModel
from hqtransformer_tpu.parallel.mesh import (global_batch, make_mesh,
                                             replicated,
                                             stage2_param_sharding)
from hqtransformer_tpu.train.scheduler import build_schedule_from_config
from hqtransformer_tpu.train.stage2 import (TrainState, make_optimizer,
                                            make_train_step)
from hqtransformer_tpu.utils.logging import RunLogger


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument('-c', '--config-path', type=str, required=True)
    ap.add_argument('-r', '--result-path', type=str, default='./results')
    ap.add_argument('--data-root', type=str, required=True)
    ap.add_argument('--stage1-ckpt', type=str, default=None,
                    help='stage-1 weights: reference .ckpt or orbax dir')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--multihost', action='store_true',
                    help='call jax.distributed.initialize() (TPU '
                         'pods / multi-process CPU); each process '
                         'then loads only its local batch slice')
    ap.add_argument('--max-steps', type=int, default=None)
    ap.add_argument('--tp', type=int, default=1,
                    help='tensor-parallel mesh axis size')
    ap.add_argument('--vocab-dir', type=str, default=None)
    ap.add_argument('--resume', type=str, default=None,
                    help='orbax ckpt dir of a previous stage-2 run: '
                         'restores params, optimizer state, and step '
                         '(the LR schedule position rides in the '
                         'optimizer state)')
    ap.add_argument('--bf16', action='store_true',
                    help='bf16 activations with f32 master params (losses '
                         'and optimizer statistics stay f32) — the TPU '
                         'analogue of the reference fp16 autocast recipe')
    ap.add_argument('--remat', action='store_true',
                    help='gradient rematerialization on the transformer '
                         'blocks (jax.checkpoint): recompute activations '
                         'in the backward pass — O(layers) less activation '
                         'HBM for ~1 extra forward of FLOPs; lets the '
                         '1.38B L42 train at larger per-chip batch. '
                         'Gradients are bit-identical; checkpoints '
                         'interchangeable')
    return ap.parse_args()


def main():
    args = parse_args()
    if args.multihost:
        jax.distributed.initialize()
    cfg = build_twostage_config(args.config_path)
    now = datetime.now().strftime('%d%m%Y_%H%M%S')
    run_dir = os.path.join(args.result_path,
                           os.path.basename(args.config_path).split('.')[0],
                           now)
    logger = RunLogger(run_dir, cfg)
    logger.line(f'devices: {jax.devices()}')

    model = TwoStageModel(cfg, dtype=jnp.bfloat16 if args.bf16
                          else jnp.float32, remat=args.remat)
    variables = model.init_variables(jax.random.PRNGKey(args.seed))
    if args.stage1_ckpt:
        if os.path.isdir(args.stage1_ckpt):
            # orbax dir written by main_stage1.py (Stage1State tree):
            # restore the latest step's generator params + EMA buffers
            from hqtransformer_tpu.checkpoint import (latest_step,
                                                      restore_checkpoint)
            state1 = restore_checkpoint(args.stage1_ckpt,
                                        step=latest_step(args.stage1_ckpt))
            variables['stage1'] = {'params': state1['gen_params'],
                                   'ema': state1['ema']}
        else:
            sd = load_torch_checkpoint(args.stage1_ckpt)
            if any(k.startswith('generator.') for k in sd):
                sd = {k[len('generator.'):]: v for k, v in sd.items()
                      if k.startswith('generator.')}
            elif any(k.startswith('stage1.') for k in sd):
                sd = {k[len('stage1.'):]: v for k, v in sd.items()
                      if k.startswith('stage1.')}
            variables['stage1'] = convert_torch_state_dict(
                sd, variables['stage1'])
        logger.line(f'stage1 restored from {args.stage1_ckpt}')
    else:
        logger.line('WARNING: training stage-2 against a RANDOM stage-1 '
                    '(pass --stage1-ckpt for real runs)')

    # ------------------------------------------------------------- data
    use_txt = bool(cfg.stage2.use_txt_cond)
    tokenizer = None
    if use_txt:
        tokenizer = create_tokenizer(cfg.dataset.tokenizer_type,
                                     vocab_dir=args.vocab_dir,
                                     dropout=cfg.dataset.bpe_pdrop)
    res = cfg.dataset.image_resolution
    n_dev = jax.device_count()
    dp = n_dev // args.tp
    global_bs = cfg.experiment.local_batch_size * dp
    train_ds = build_dataset(cfg.dataset.dataset or 'imagenet',
                             args.data_root, 'train', tokenizer,
                             cfg.dataset.context_length)
    steps_per_epoch = max(1, len(train_ds) // global_bs)
    total_steps = args.max_steps or steps_per_epoch * cfg.experiment.epochs
    logger.line(f'{len(train_ds)} images, {steps_per_epoch} steps/epoch, '
                f'{total_steps} steps, global batch {global_bs}, '
                f'mesh dp={dp} tp={args.tp}')

    # ------------------------------------------------------------ training
    mesh = make_mesh(dp=dp, tp=args.tp)
    schedule = build_schedule_from_config(cfg.optimizer, steps_per_epoch,
                                          total_steps, world_size=n_dev)
    grad_accm = max(1, cfg.experiment.total_batch_size // global_bs)
    if grad_accm > 1:
        logger.line(f'gradient accumulation x{grad_accm} '
                    f'(effective batch {global_bs * grad_accm})')
    opt = make_optimizer(cfg.optimizer, schedule, grad_accm)
    multilevel = 'multilevel-hq' in cfg.stage2.type
    train_step = make_train_step(
        model.stage2, model.stage1, opt,
        weight_bottom=cfg.stage2.weight_bottom or 4.0,
        weight_img=cfg.stage2.weight_img, weight_txt=cfg.stage2.weight_txt,
        temp_soft_labels=cfg.stage2.temp_soft_labels,
        use_cond=bool(cfg.stage2.use_cls_cond or use_txt),
        multilevel=multilevel)
    jit_step = jax.jit(train_step)

    from hqtransformer_tpu.train.stage2 import (cross_entropy,
                                                hierarchical_loss,
                                                multilevel_loss)

    @jax.jit
    def eval_step(params, stage1_vars, images, labels):
        cond = labels if (cfg.stage2.use_cls_cond or use_txt) else None
        B = images.shape[0]
        if multilevel:
            codes = model.stage1.apply(stage1_vars, images,
                                       method=type(model.stage1).get_codes)
            codes = [c.reshape(B, -1) for c in codes]
            logits = model.stage2.apply({'params': params}, codes, cond)
            _, m = multilevel_loss(logits, codes, None, labels,
                                   weight_img=cfg.stage2.weight_img,
                                   weight_txt=cfg.stage2.weight_txt)
        else:
            ct, cb = model.stage1.apply(stage1_vars, images,
                                        method=type(model.stage1).get_codes)
            ct, cb = ct.reshape(B, -1), cb.reshape(B, -1)
            logits = model.stage2.apply({'params': params}, ct, cb, cond)
            _, m = hierarchical_loss(
                logits, (ct, cb), None, labels,
                weight_bottom=cfg.stage2.weight_bottom or 4.0,
                weight_img=cfg.stage2.weight_img,
                weight_txt=cfg.stage2.weight_txt)
        return m

    def run_validation(params, stage1_vars, step, max_batches=8):
        try:
            valid_ds = build_dataset(cfg.dataset.dataset or 'imagenet',
                                     args.data_root, 'val', tokenizer,
                                     cfg.dataset.context_length)
        except (FileNotFoundError, AssertionError):
            return
        vcfg = LoaderConfig(batch_size=min(cfg.experiment.valid_batch_size,
                                           max(1, len(valid_ds))),
                            resolution=res,
                            dataset_name=cfg.dataset.dataset or 'imagenet',
                            train=False)
        all_m = {}
        for bi, (x_np, l_np) in enumerate(DataLoader(valid_ds, vcfg)):
            m = eval_step(params, stage1_vars, jnp.asarray(x_np),
                          jnp.asarray(l_np).astype(jnp.int32))
            for k, v in m.items():
                all_m.setdefault(k, []).append(float(v))
            if bi + 1 >= max_batches:
                break
        if all_m:
            means = {k: float(np.mean(v)) for k, v in all_m.items()}
            logger.line('valid ' + ' '.join(f'{k}={v:.4f}'
                                            for k, v in sorted(means.items()))
                        + f' @ step {step}')
            logger.scalars(means, step, 'valid')

    with mesh:
        params = jax.device_put(
            variables['stage2']['params'],
            stage2_param_sharding(mesh, variables['stage2']['params']))
        state = TrainState(jnp.zeros((), jnp.int32), params,
                           opt.init(params))
        start_step = 0
        if args.resume:
            from hqtransformer_tpu.checkpoint import (latest_step,
                                                      restore_checkpoint)
            resume_step = latest_step(args.resume)
            restored = restore_checkpoint(
                args.resume, step=resume_step,
                template=jax.device_get(state._asdict()))
            # re-apply the live state's shardings to the restored arrays;
            # scalars (step, optax counts) were created eagerly without a
            # mesh sharding — replicate those explicitly or jit rejects
            # the device mix
            from jax.sharding import NamedSharding

            def _resharded(old, new):
                sh = (old.sharding
                      if isinstance(old.sharding, NamedSharding)
                      else replicated(mesh))
                return jax.device_put(jnp.asarray(new), sh)

            state = TrainState(**jax.tree.map(_resharded, state._asdict(),
                                              restored))
            # continue the TRUE step count: step labels, checkpoint dir
            # names, the total_steps bound, and per-epoch loader seeding
            # all pick up where the preempted run stopped
            start_step = resume_step
            logger.line(f'resumed from {args.resume} @ step {resume_step}')
        stage1_vars = jax.device_put(
            variables['stage1'],
            jax.tree.map(lambda _: replicated(mesh), variables['stage1']))

        # each process loads only its host-local slice
        host_bs = cfg.experiment.local_batch_size * (jax.local_device_count() // args.tp)
        loader_cfg = LoaderConfig(batch_size=host_bs, resolution=res,
                                  dataset_name=cfg.dataset.dataset or
                                  'imagenet', train=True, seed=args.seed,
                                  shard_index=jax.process_index(),
                                  shard_count=jax.process_count())
        assert len(train_ds) >= global_bs, (
            f'dataset ({len(train_ds)} images) smaller than one global '
            f'batch ({global_bs}); reduce local_batch_size')
        step, t0 = start_step, time.time()
        # a mid-epoch resume fast-forwards the first epoch's loader past the
        # already-consumed batches: the per-epoch seed makes the order
        # deterministic, so skipping start_step % steps_per_epoch batches
        # reproduces the uninterrupted run's data order exactly
        skip = start_step % steps_per_epoch
        if skip:
            logger.line(f'resume mid-epoch: skipping {skip} consumed batches')
        for epoch in range(start_step // steps_per_epoch, 10 ** 9):
            if step >= total_steps:
                break
            loader_cfg.seed = args.seed + epoch
            for x_np, labels_np in PrefetchLoader(
                    DataLoader(train_ds, loader_cfg)):
                if skip:
                    skip -= 1
                    continue
                x = global_batch(mesh, x_np)
                labels = global_batch(
                    mesh, np.asarray(labels_np).astype(np.int32))
                state, metrics = jit_step(state, stage1_vars, x, labels)
                step += 1
                if step % 50 == 0 or step == start_step + 1:
                    m = {k: float(v) for k, v in metrics.items()}
                    dt = (time.time() - t0) / (step - start_step)
                    logger.line(f'step {step}/{total_steps} '
                                f'({global_bs / dt:.1f} img/s) ' +
                                ' '.join(f'{k}={v:.4f}'
                                         for k, v in sorted(m.items())))
                    logger.scalars(m, step)
                if step >= total_steps:
                    break
            if step >= total_steps:
                break
            if (epoch + 1) % cfg.experiment.test_freq == 0:
                run_validation(state.params, stage1_vars, step)
            if (epoch + 1) % cfg.experiment.save_ckpt_freq == 0:
                save_checkpoint(os.path.join(run_dir, 'ckpt'),
                                jax.device_get(state._asdict()), step)
                logger.line(f'checkpoint saved @ step {step}')

    # full training state (params + optimizer + step) so --resume can
    # continue a preempted run exactly; the sampler-ready bundle below is
    # the artifact downstream tools restore
    save_checkpoint(os.path.join(run_dir, 'ckpt'),
                    jax.device_get(state._asdict()), step)
    # combined sampler-ready checkpoint (frozen stage-1 + trained stage-2),
    # restorable directly by sampling_hqmodel.py — mirrors the reference's
    # released stage-2 .ckpt files which bundle both stages' weights
    save_checkpoint(os.path.join(run_dir, 'ckpt_full'),
                    {'stage1': jax.device_get(stage1_vars),
                     'stage2': {'params': jax.device_get(state.params)}},
                    step)
    logger.line(f'final checkpoint saved @ step {step}')
    logger.close()


if __name__ == '__main__':
    main()
