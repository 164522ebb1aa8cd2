#!/usr/bin/env python
"""Class-conditional 50k-sample generation — the `sampling_hqmodel.py`
surface of the reference, TPU-native.

Writes the same artifacts the reference eval pipeline consumes
(`/root/reference/sampling_hqmodel.py:217-225`): pickled float arrays
[B, 3, H, W] in [0, 1] as `samples_(<cls+1>_<batch>).pkl` plus
`targets_(<cls+1>_<batch>).npz`, 50000/num-classes samples per class.

Model loading: `-m` accepts either a reference Lightning .ckpt (torch
state_dict with stage1./stage2. keys, converted on load) or an Orbax
checkpoint dir produced by this framework; `--random-init` builds from the
config alone (smoke/throughput runs, as the reference's measure_throughput
does, `measure_throughput/__main__.py:25-31`).
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.twostage import TwoStageModel
from hqtransformer_tpu.sampling.engine import SamplingParams


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument('-r', '--result-path', type=str, required=True)
    ap.add_argument('-m', '--model-path', type=str, default='')
    ap.add_argument('-c', '--config', type=str, default=None,
                    help='model config yaml (defaults to '
                         '<model-path dir>/config.yaml)')
    ap.add_argument('--random-init', action='store_true')
    ap.add_argument('--top-k', type=int, default=2048)
    ap.add_argument('--top-p', type=float, default=1.0)
    ap.add_argument('--temperature', type=float, default=1.0)
    ap.add_argument('--temperature-decay', type=float, default=1.0)
    ap.add_argument('--batch-size', type=int, default=50)
    ap.add_argument('--code-level', type=int, default=2)
    ap.add_argument('--top-resolution', type=int, default=8)
    ap.add_argument('--bot-resolution', type=int, default=16)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--num-classes', type=int, default=1000)
    ap.add_argument('--total-samples', type=int, default=50000)
    ap.add_argument('--dtype', choices=['float32', 'bfloat16'],
                    default='bfloat16')
    ap.add_argument('--attention', choices=['auto', 'packed', 'einsum'],
                    default='auto',
                    help='decode-attention impl: packed = fused Pallas '
                         'kernel over [L,T,B,D] caches (TPU), einsum = '
                         'per-head XLA path; auto picks per backend')
    return ap.parse_args()


def load_model(args):
    cfg_path = args.config
    if cfg_path is None and args.model_path:
        base = (os.path.dirname(args.model_path)
                if os.path.isfile(args.model_path) else args.model_path)
        for cand in (os.path.join(base, 'config.yaml'),
                     os.path.join(base, '..', 'config.yaml')):
            if os.path.exists(cand):
                cfg_path = cand
                break
    assert cfg_path, 'pass -c/--config (or put config.yaml next to -m)'
    cfg = build_twostage_config(cfg_path)
    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    model = TwoStageModel(cfg, dtype=dtype)
    variables = model.init_variables(jax.random.PRNGKey(args.seed))
    if args.model_path and not args.random_init:
        if args.model_path.endswith(('.ckpt', '.pth', '.pt')):
            variables = model.load_reference_checkpoint(args.model_path,
                                                        variables)
            print(f'{args.model_path} (torch) successfully restored..')
        else:
            from hqtransformer_tpu.checkpoint import (latest_step,
                                                      restore_checkpoint)
            variables = restore_checkpoint(args.model_path,
                                           step=latest_step(args.model_path),
                                           template=variables)
            print(f'{args.model_path} (orbax) successfully restored..')
    return model, variables


def save_pickle(fname, data):
    with open(fname, 'wb') as fp:
        pickle.dump(data, fp, pickle.HIGHEST_PROTOCOL)


def main():
    args = parse_args()
    os.makedirs(args.result_path, exist_ok=True)
    model, variables = load_model(args)

    temps = [args.temperature * (args.temperature_decay ** i)
             for i in range(args.code_level)]
    top_p = args.top_p if args.top_p and args.top_p < 1.0 else None

    if args.code_level == 2:
        sp = SamplingParams(top_k_top=args.top_k, top_p_top=top_p,
                            top_k_bot=args.top_k, top_p_bot=top_p,
                            temperature_top=temps[0],
                            temperature_bot=temps[1])
        sampler = model.make_pixel_sampler(params=sp,
                                           cache_dtype=model.dtype,
                                           attention=args.attention)
    else:
        sampler = model.make_pixel_sampler_multilevel(
            top_k=(args.top_k,) * 3, top_p=(top_p,) * 3,
            temperature=tuple(temps), cache_dtype=model.dtype)

    key = jax.random.PRNGKey(args.seed)
    cls_max = args.total_samples // args.num_classes
    n_batches = max(1, cls_max // args.batch_size)

    t_start = time.time()
    n_done = 0
    pbar = tqdm(range(args.num_classes), total=args.num_classes)
    for cls_idx in pbar:
        for bi in range(n_batches):
            labels = jnp.full((args.batch_size,), cls_idx, jnp.int32)
            key, k = jax.random.split(key)
            pixels, _ = sampler(variables, k, labels)
            arr = np.asarray(pixels, np.float32).transpose(0, 3, 1, 2)
            save_pickle(os.path.join(
                args.result_path, f'samples_({cls_idx + 1}_{bi}).pkl'), arr)
            np.savez(os.path.join(
                args.result_path, f'targets_({cls_idx + 1}_{bi}).npz'),
                targets=np.full((args.batch_size,), cls_idx, np.int64))
            n_done += args.batch_size
            speed = (time.time() - t_start) / n_done * 1000
            pbar.set_description(f'{speed:.2f} ms/sample')
    print(f'done: {n_done} samples -> {args.result_path}')


if __name__ == '__main__':
    main()
