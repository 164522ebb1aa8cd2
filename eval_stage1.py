#!/usr/bin/env python
"""Stage-1 reconstruction eval: MSE, rFID, per-level codebook usage —
the `eval_stage1.py` surface of the reference
(`/root/reference/eval_stage1.py:68-247`).

Loads a stage-1 checkpoint (reference torch .ckpt with 'generator.'-prefixed
keys, a two-stage ckpt's stage1.* subtree, or an Orbax dir), reconstructs
the validation split, and reports MSE + rFID (requires --inception-weights)
+ per-level code-usage fractions, optionally with top-only reconstructions
(`eval_stage1.py:93-125`).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from hqtransformer_tpu.checkpoint import (convert_torch_state_dict,
                                          load_torch_checkpoint)
from hqtransformer_tpu.config import build_stage1_config
from hqtransformer_tpu.data.datasets import DataLoader, LoaderConfig, \
    build_dataset
from hqtransformer_tpu.models.stage1.generator import build_generator


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument('-c', '--config-path', type=str, required=True)
    ap.add_argument('-m', '--model-path', type=str, default=None)
    ap.add_argument('--data-root', type=str, required=True)
    ap.add_argument('--batch-size', type=int, default=16)
    ap.add_argument('--max-batches', type=int, default=None)
    ap.add_argument('--fid', action='store_true')
    ap.add_argument('--code-usage', action='store_true')
    ap.add_argument('--top-only', action='store_true',
                    help='also evaluate top-code-only reconstructions')
    ap.add_argument('--inception-weights', type=str,
                    default=os.environ.get('FID_INCEPTION_WEIGHTS'))
    return ap.parse_args()


def main():
    args = parse_args()
    cfg = build_stage1_config(args.config_path)
    generator = build_generator(cfg.stage1)
    res = cfg.dataset.image_resolution
    x0 = jnp.zeros((1, res, res, 3))
    variables = generator.init(jax.random.PRNGKey(0), x0)
    if args.model_path and os.path.isdir(args.model_path):
        # Orbax dir from main_stage1.py (ckpt/<step>/ holding the full
        # Stage1State tree): restore the latest step's generator params+ema
        from hqtransformer_tpu.checkpoint import (latest_step,
                                                  restore_checkpoint)
        step = latest_step(args.model_path)
        state = restore_checkpoint(args.model_path, step=step)
        variables = {'params': state['gen_params'], 'ema': state['ema']}
        print(f'{args.model_path} (orbax, step {step}) restored..')
    elif args.model_path:
        sd = load_torch_checkpoint(args.model_path)
        if any(k.startswith('stage1.') for k in sd):
            sd = {k[len('stage1.'):]: v for k, v in sd.items()
                  if k.startswith('stage1.')}
            variables = convert_torch_state_dict(sd, variables)
        elif any(k.startswith('generator.') for k in sd):
            # stage-1 training ckpt: strip 'generator.'; drop discriminator
            sd = {k[len('generator.'):]: v for k, v in sd.items()
                  if k.startswith('generator.')}
            variables = convert_torch_state_dict(sd, variables)
        else:
            variables = convert_torch_state_dict(sd, variables)
        print(f'{args.model_path} successfully restored..')

    ds = build_dataset(cfg.dataset.dataset or 'imagenet', args.data_root,
                       'val')
    loader = DataLoader(ds, LoaderConfig(batch_size=args.batch_size,
                                         resolution=res, train=False))

    @jax.jit
    def recon(x):
        dec, diffs, codes = generator.apply(variables, x)
        return jnp.clip(dec, -1, 1), codes

    @jax.jit
    def recon_top(x):
        (dec_t, dec_b, dec_tb), diffs, codes = generator.apply(
            variables, x, method=type(generator).forward_topbottom)
        return jnp.clip(dec_t, -1, 1)

    n_embed = cfg.stage1.n_embed
    usage = {}
    mse_sum, n_img = 0.0, 0
    mse_top_sum = 0.0
    reals, fakes = [], []
    extractor = None
    if args.fid:
        from hqtransformer_tpu.evaluation.fid import InceptionExtractor
        extractor = InceptionExtractor(weights_path=args.inception_weights,
                                       batch_size=args.batch_size)

    for bi, (x_np, _) in enumerate(tqdm(loader, total=len(loader))):
        x = jnp.asarray(x_np)
        dec, codes = recon(x)
        mse_sum += float(jnp.sum(jnp.mean(jnp.square(dec - x),
                                          axis=(1, 2, 3))))
        n_img += x.shape[0]
        if args.top_only:
            dec_t = recon_top(x)
            mse_top_sum += float(jnp.sum(jnp.mean(jnp.square(dec_t - x),
                                                  axis=(1, 2, 3))))
        if args.code_usage:
            code_list = codes[:2] if isinstance(codes, tuple) else codes[:-1]
            for li, c in enumerate(code_list):
                u = usage.setdefault(li, np.zeros(n_embed, np.int64))
                binc = np.bincount(np.asarray(c).reshape(-1),
                                   minlength=n_embed)
                u += binc
        if extractor is not None:
            reals.append(extractor.features(
                np.asarray(x * 0.5 + 0.5, np.float32)))
            fakes.append(extractor.features(
                np.asarray(dec * 0.5 + 0.5, np.float32)))
        if args.max_batches and bi + 1 >= args.max_batches:
            break

    print(f'MSE: {mse_sum / n_img:.6f} over {n_img} images')
    if args.top_only:
        print(f'MSE (top-only recon): {mse_top_sum / n_img:.6f}')
    if args.code_usage:
        for li, u in sorted(usage.items()):
            frac = float((u > 0).mean())
            print(f'level {li}: {frac * 100:.2f}% of {n_embed} codes used')
    if extractor is not None:
        from hqtransformer_tpu.evaluation.fid import (frechet_distance,
                                                      mean_covar_numpy)
        mu_r, s_r = mean_covar_numpy(np.concatenate(reals))
        mu_f, s_f = mean_covar_numpy(np.concatenate(fakes))
        rfid = frechet_distance(mu_r, s_r, mu_f, s_f)
        print(f'rFID: {rfid:.4f}')


if __name__ == '__main__':
    main()
