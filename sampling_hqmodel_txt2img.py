#!/usr/bin/env python
"""Text-conditional sampling over validation captions — the
`sampling_hqmodel_txt2img.py` surface of the reference, TPU-native.

Tokenizes caption batches (CC3M val list), generates one candidate per
caption through the jit-compiled scan sampler, and writes the same pickled
pixel batches as the class-conditional script
(`/root/reference/sampling_hqmodel_txt2img.py:179-217`).
Captions may come from a CC3M tsv (--data-root) or a plain text file with
one caption per line (--captions).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.data.tokenizers import create_tokenizer
from hqtransformer_tpu.models.twostage import TwoStageModel
from hqtransformer_tpu.sampling.engine import SamplingParams


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument('-r', '--result-path', type=str, required=True)
    ap.add_argument('-m', '--model-path', type=str, default='')
    ap.add_argument('-c', '--config', type=str, required=True)
    ap.add_argument('--random-init', action='store_true')
    ap.add_argument('--data-root', type=str, default=None,
                    help='CC3M root containing val_list.txt')
    ap.add_argument('--captions', type=str, default=None,
                    help='plain text file, one caption per line')
    ap.add_argument('--top-k', type=int, default=8192)
    ap.add_argument('--top-p', type=float, default=1.0)
    ap.add_argument('--temperature', type=float, default=0.9)
    ap.add_argument('--temperature-decay', type=float, default=1.0)
    ap.add_argument('--batch-size', type=int, default=16)
    ap.add_argument('--code-level', type=int, default=2)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--max-batches', type=int, default=None)
    ap.add_argument('--vocab-dir', type=str, default=None)
    ap.add_argument('--dtype', choices=['float32', 'bfloat16'],
                    default='bfloat16')
    ap.add_argument('--clip-rerank', type=int, default=0, metavar='N',
                    help='generate N candidates per caption and keep them '
                         'CLIP-ranked best-first (the demo notebook\'s '
                         'clip_reranking; requires --clip-weights)')
    ap.add_argument('--clip-weights', type=str, default=None,
                    help='official CLIP ViT-B/32 state_dict (.pt)')
    return ap.parse_args()


def load_captions(args):
    if args.captions:
        with open(args.captions) as fp:
            return [ln.strip() for ln in fp if ln.strip()]
    assert args.data_root, 'pass --captions or --data-root'
    caps = []
    with open(os.path.join(args.data_root, 'val_list.txt')) as fp:
        for ln in fp:
            parts = ln.rstrip('\n').split('\t')
            if len(parts) >= 2:
                caps.append(parts[1])
    return caps


def save_pickle(fname, data):
    with open(fname, 'wb') as fp:
        pickle.dump(data, fp, pickle.HIGHEST_PROTOCOL)


def main():
    args = parse_args()
    os.makedirs(args.result_path, exist_ok=True)

    cfg = build_twostage_config(args.config)
    dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    model = TwoStageModel(cfg, dtype=dtype)
    variables = model.init_variables(jax.random.PRNGKey(args.seed))
    if args.model_path and not args.random_init:
        variables = model.load_reference_checkpoint(args.model_path,
                                                    variables)
        print(f'{args.model_path} successfully restored..')

    tokenizer = create_tokenizer(cfg.dataset.tokenizer_type,
                                 vocab_dir=args.vocab_dir)
    ctx_len = cfg.stage2.hparams.ctx_len_txt
    captions = load_captions(args)

    temps = [args.temperature * (args.temperature_decay ** i)
             for i in range(args.code_level)]
    top_p = args.top_p if args.top_p and args.top_p < 1.0 else None
    sp = SamplingParams(top_k_top=args.top_k, top_p_top=top_p,
                        top_k_bot=args.top_k, top_p_bot=top_p,
                        temperature_top=temps[0], temperature_bot=temps[-1])
    sampler = model.make_pixel_sampler(params=sp, cache_dtype=model.dtype)

    key = jax.random.PRNGKey(args.seed)
    bs = args.batch_size
    n_batches = len(captions) // bs
    if args.max_batches:
        n_batches = min(n_batches, args.max_batches)

    clip_model = clip_vars = None
    if args.clip_rerank:
        import torch
        from hqtransformer_tpu.evaluation.clip_rerank import (
            CLIP, load_torch_clip)
        assert args.clip_weights, '--clip-rerank requires --clip-weights'
        clip_model = CLIP()
        cvars = clip_model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 224, 224, 3)),
                                jnp.zeros((1, 77), jnp.int32))
        sd = torch.load(args.clip_weights, map_location='cpu')
        sd = sd.state_dict() if hasattr(sd, 'state_dict') else sd
        clip_vars = load_torch_clip(cvars, sd)
        # CLIP's text tower needs its own 49408-token BPE (sot/eot-wrapped),
        # NOT the model's caption tokenizer (the reference notebook uses
        # clip.tokenize separately from the dataset tokenizer).
        clip_tokenizer = create_tokenizer('clip', vocab_dir=args.vocab_dir)
        print('CLIP weights loaded for re-ranking')

    for bi in tqdm(range(n_batches), total=n_batches):
        batch = captions[bi * bs:(bi + 1) * bs]
        if args.clip_rerank:
            # one caption per step, N candidates, keep CLIP-ranked
            from hqtransformer_tpu.evaluation.clip_rerank import clip_rerank
            n = args.clip_rerank
            ranked_all, scores_all = [], []
            for cap in batch:
                toks = np.asarray(tokenizer.encode_padded(cap, ctx_len),
                                  np.int32)[None].repeat(n, 0)
                key, k = jax.random.split(key)
                pixels, _ = sampler(variables, k, jnp.asarray(toks))
                px = np.asarray(pixels, np.float32)
                order, scores = clip_rerank(
                    clip_model, clip_vars, px,
                    np.asarray(clip_tokenizer.encode_padded(cap, 77),
                               np.int32)[None])
                ranked_all.append(px[order])
                scores_all.append(scores)
            arr = np.stack(ranked_all).transpose(0, 1, 4, 2, 3)
            save_pickle(os.path.join(
                args.result_path, f'samples_({bi + 1}_{bs}).pkl'), arr)
            np.savez(os.path.join(args.result_path,
                                  f'clip_scores_({bi + 1}_{bs}).npz'),
                     scores=np.stack(scores_all))
        else:
            tokens = np.stack([tokenizer.encode_padded(c, ctx_len)
                               for c in batch]).astype(np.int32)
            key, k = jax.random.split(key)
            pixels, _ = sampler(variables, k, jnp.asarray(tokens))
            arr = np.asarray(pixels, np.float32).transpose(0, 3, 1, 2)
            save_pickle(os.path.join(args.result_path,
                                     f'samples_({bi + 1}_{bs}).pkl'), arr)
        with open(os.path.join(args.result_path,
                               f'captions_({bi + 1}_{bs}).txt'), 'w') as fp:
            fp.write('\n'.join(batch))
    print(f'done: {n_batches * bs} samples -> {args.result_path}')


if __name__ == '__main__':
    main()
