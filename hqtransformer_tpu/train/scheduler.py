"""LR schedule: linear warmup (+ optional buffer plateau) into cosine
annealing, the composition of `GradualWarmup` + `CosineAnnealingLR`
(`hqvae/optimizers/scheduler.py:11-113`), as a pure optax-style schedule.

Reference semantics, step-indexed from 1 (torch schedulers step after the
optimizer): lr(t) = base*mult*min(1, t/warmup) during warmup (start_from_zero)
or base*(1+(mult-1)*min(1, t/warmup)); held at base*mult through the buffer;
then cosine from base to min_lr over (final - warmup - buffer) steps.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp


def build_schedule(base_lr: float,
                   steps_per_epoch: int,
                   final_steps: int,
                   warmup_epoch: float = 0.0,
                   buffer_epoch: float = 0.0,
                   multiplier: float = 1.0,
                   min_lr: float = 0.0,
                   mode: str = 'fix',
                   start_from_zero: bool = True,
                   world_size: Optional[int] = None,
                   sched_type: str = 'cosine'):
    """Returns schedule(step) -> lr (jnp scalar), matching
    `build_scheduler` (`scheduler.py:11-59`).

    sched_type='const' implements the reference's *intent* — step decay
    x0.1 at every half of the post-warmup horizon — because the reference
    branch itself cannot run: `StepLR(optimizer, factor=..., total_iters=...)`
    (`hqvae/optimizers/scheduler.py:31-33`) is not StepLR's signature
    (step_size/gamma), so any config selecting it crashes the reference at
    build time (and no configs/master YAML does). Read gamma=0.1 from
    `factor` and the decay period from `total_iters`."""
    warmup_steps = warmup_epoch * steps_per_epoch
    buffer_steps = buffer_epoch * steps_per_epoch
    t_max = final_steps - warmup_steps - buffer_steps
    if sched_type not in ('cosine', 'const', None):
        raise NotImplementedError(
            f'{sched_type} is not supported (scheduler.py:35)')

    if warmup_steps > 0:
        if mode == 'linear':
            multiplier = max(1.0, multiplier * world_size)
        elif mode == 'sqrt':
            multiplier = max(1.0, multiplier * math.sqrt(world_size))
        elif mode == 'fix':
            multiplier = max(1.0, multiplier)
        elif mode != 'none':
            raise NotImplementedError(f'{mode} is not a valid warmup policy')

    def schedule(step):
        # torch _LRScheduler.__init__ performs one implicit step(), so the lr
        # used for optimizer update `step` (0-indexed) is the reference
        # scheduler's value at index step+1 (`scheduler.py:62-95`)
        step = jnp.asarray(step, jnp.float32) + 1.0
        if warmup_steps > 0:
            frac = jnp.minimum(1.0, step / warmup_steps)
            if start_from_zero:
                warm_lr = base_lr * multiplier * frac
            else:
                warm_lr = base_lr * (1.0 + (multiplier - 1.0) * frac)
        else:
            warm_lr = jnp.asarray(base_lr)
        cos_step = jnp.maximum(0.0, step - warmup_steps - buffer_steps)
        if sched_type == 'const':
            # StepLR intent: gamma=0.1 ("factor") every t_max//2 steps
            # ("total_iters"); torch StepLR has no eta_min floor
            period = max(1.0, float(int(t_max) // 2))
            after_lr = base_lr * 0.1 ** jnp.floor(cos_step / period)
        else:
            after_lr = min_lr + (base_lr - min_lr) * (1.0 + jnp.cos(
                jnp.pi * jnp.minimum(cos_step, t_max) / t_max)) / 2
        return jnp.where(step <= warmup_steps + buffer_steps, warm_lr,
                         after_lr)

    return schedule


def build_schedule_from_config(opt_cfg, steps_per_epoch: int,
                               final_steps: int,
                               world_size: Optional[int] = None):
    """From an OptConfig (stage-1 `warmup_config` or stage-2 `warmup`)."""
    w = opt_cfg.warmup if opt_cfg.warmup is not None else opt_cfg.warmup_config
    return build_schedule(opt_cfg.base_lr, steps_per_epoch, final_steps,
                          warmup_epoch=w.warmup_epoch,
                          buffer_epoch=w.buffer_epoch,
                          multiplier=w.multiplier, min_lr=w.min_lr,
                          mode=w.mode, start_from_zero=w.start_from_zero,
                          world_size=world_size,
                          sched_type=getattr(opt_cfg, 'sched_type',
                                             'cosine'))
