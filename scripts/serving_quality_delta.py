#!/usr/bin/env python
"""Distribution-level quality deltas of the serving modes vs the
parity-tested float path, on a REAL trained model (the convergence-demo
tiny two-stage model).

The per-step divergence tests (tests/test_bf16_divergence.py) bound the
numerics; this script adds the end statement the ≥5x-with-FID-parity
contract needs: sample the SAME trained model through each serving mode and
measure the pixel-space Frechet distance (a) against the training set and
(b) directly between each mode's samples and the baseline's. Modes:

  base         f32 params, einsum attention   (the parity-tested oracle)
  packed_bf16  bf16 params, packed cache      (the bench serving path)
  int8_kv      + int8 KV cache                (calibrate_kv_scales)
  int8_decode  + int8 stage-1 decode          (calibrate_int8_decode)
  int8_full    + both int8 modes              (the full int8 serving mode)

Reuses (or trains) the convergence-demo checkpoint. Prints one JSON line.

    python scripts/serving_quality_delta.py --workdir /tmp/conv_demo

Numerics stance mirrors the reference's fp16-autocast sampling vs its fp32
forward (`hqvae/models/stage2/hierarchical_ar.py:445`): serving modes are
allowed per-step rounding, but must be distribution-equivalent.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

CFG = os.path.join(REPO, 'configs', 'tiny', 'convergence-tiny.yaml')


def ensure_checkpoint(wd: str, stage1_steps: int, stage2_steps: int) -> str:
    """Train the tiny two-stage model through the real CLIs if the
    convergence-demo checkpoint is not already in the workdir."""
    from scripts.demo_convergence import latest_subdir, make_dataset, run
    s2_root = os.path.join(wd, 's2', 'convergence-tiny')
    if os.path.isdir(s2_root):
        ckpt = os.path.join(latest_subdir(s2_root), 'ckpt_full')
        if os.path.isdir(ckpt):
            return ckpt
    data = os.path.join(wd, 'data')
    if not os.path.isdir(os.path.join(data, 'train')):
        print('[setup] building synthetic dataset..', flush=True)
        make_dataset(data)
    print('[setup] training stage-1..', flush=True)
    run(['main_stage1.py', '-c', CFG, '-r', os.path.join(wd, 's1'),
         '--data-root', data, '--max-steps', str(stage1_steps)])
    s1_ckpt = os.path.join(latest_subdir(
        os.path.join(wd, 's1', 'convergence-tiny')), 'ckpt')
    print('[setup] training stage-2..', flush=True)
    run(['main_stage2.py', '-c', CFG, '-r', os.path.join(wd, 's2'),
         '--data-root', data, '--stage1-ckpt', s1_ckpt,
         '--max-steps', str(stage2_steps)])
    return os.path.join(latest_subdir(s2_root), 'ckpt_full')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', type=str, default='/tmp/conv_demo')
    ap.add_argument('--n-samples', type=int, default=200)
    ap.add_argument('--batch-size', type=int, default=50)
    ap.add_argument('--stage1-steps', type=int, default=400)
    ap.add_argument('--stage2-steps', type=int, default=600)
    ap.add_argument('--modes', type=str, default='',
                    help='comma list restricting the serving modes measured '
                         '(base always included); default all')
    ap.add_argument('--bootstrap', type=int, default=200,
                    help='paired-bootstrap draws for the 95%% CIs of the '
                         'per-mode Frechet deltas (0 disables)')
    ap.add_argument('--out', type=str, default='')
    args = ap.parse_args()

    import jax
    # quantization math is platform-independent: force CPU regardless of
    # the box's sitecustomize JAX_PLATFORMS=axon (this harness should
    # never contend for — or hang on — the tunneled TPU); opt out with
    # HQT_QUALITY_PLATFORM=axon to run on-device
    jax.config.update('jax_platforms',
                      os.environ.get('HQT_QUALITY_PLATFORM', 'cpu') or 'cpu')
    import jax.numpy as jnp

    from hqtransformer_tpu.checkpoint import latest_step, restore_checkpoint
    from hqtransformer_tpu.config import build_twostage_config
    from hqtransformer_tpu.evaluation.fid import (PixelExtractor,
                                                  frechet_distance,
                                                  mean_covar_numpy)
    from hqtransformer_tpu.models.twostage import (TwoStageModel,
                                                   serving_bf16_params)
    from hqtransformer_tpu.sampling.engine import SamplingParams

    wd = os.path.abspath(args.workdir)
    ckpt = ensure_checkpoint(wd, args.stage1_steps, args.stage2_steps)
    cfg = build_twostage_config(CFG)
    model_f32 = TwoStageModel(cfg, dtype=jnp.float32)
    model_bf16 = TwoStageModel(cfg, dtype=jnp.bfloat16)
    template = model_f32.init_variables(jax.random.PRNGKey(0))
    variables = restore_checkpoint(ckpt, step=latest_step(ckpt),
                                   template=template)
    print(f'[setup] restored {ckpt}', flush=True)

    sp = SamplingParams(top_k_top=64, top_k_bot=64,
                        temperature_top=1.0, temperature_bot=1.0)
    n, bs = args.n_samples, args.batch_size
    labels = (np.arange(n) % 10).astype(np.int32)

    vars_bf16 = serving_bf16_params(variables)
    k_cal = jax.random.PRNGKey(99)
    cal_labels = jnp.asarray(labels[:min(bs, n)])
    vars_kv = model_bf16.calibrate_kv_scales(vars_bf16, k_cal, cal_labels,
                                             params=sp)
    # decode-scale calibration on codes from a short sampling pass
    codes_cal = model_bf16.make_pixel_sampler(params=sp)(
        vars_bf16, k_cal, cal_labels)[1]
    tr = model_bf16.top_res
    ct = codes_cal[0].reshape(-1, tr, tr)
    from hqtransformer_tpu.models.stage2.hierarchical import cells_to_raster
    cb = cells_to_raster(codes_cal[1], tr, model_bf16.cell_win).reshape(
        -1, tr * model_bf16.cell_win, tr * model_bf16.cell_win)
    os.environ['HQT_INT8_DECODE'] = '1'
    vars_dec = model_bf16.calibrate_int8_decode(vars_bf16, ct, cb)
    # stage-2 depth-chain gemm scales, calibrated on teacher-forced codes
    vars_s2 = model_bf16.calibrate_stage2_int8(
        vars_bf16, codes_cal[0], cells_to_raster(
            codes_cal[1], tr, model_bf16.cell_win).reshape(
            codes_cal[0].shape[0], -1), cal_labels)
    vars_full = {**vars_kv,
                 'stage1': vars_dec['stage1']}
    vars_max = {**vars_full,
                'stage2': {**vars_kv['stage2'],
                           'act_scales': vars_s2['stage2']['act_scales']}}

    OFF = {'HQT_INT8_DECODE': '0', 'HQT_INT8_STAGE2': '0',
           'HQT_INT8_SPATIAL': '0'}
    modes = {
        'base': (model_f32, variables, dict(attention='einsum'), OFF),
        'packed_bf16': (model_bf16, vars_bf16,
                        dict(attention='packed',
                             cache_dtype=jnp.bfloat16), OFF),
        'int8_kv': (model_bf16, vars_kv,
                    dict(attention='packed', cache_dtype=jnp.int8), OFF),
        'int8_decode': (model_bf16, vars_dec,
                        dict(attention='packed',
                             cache_dtype=jnp.bfloat16),
                        {**OFF, 'HQT_INT8_DECODE': '1'}),
        'int8_stage2': (model_bf16, vars_s2,
                        dict(attention='packed',
                             cache_dtype=jnp.bfloat16),
                        {**OFF, 'HQT_INT8_STAGE2': '1'}),
        'int8_full': (model_bf16, vars_full,
                      dict(attention='packed', cache_dtype=jnp.int8),
                      {**OFF, 'HQT_INT8_DECODE': '1'}),
        'int8_spatial': (model_bf16, vars_s2,
                         dict(attention='packed',
                              cache_dtype=jnp.bfloat16),
                         {**OFF, 'HQT_INT8_STAGE2': '1',
                          'HQT_INT8_SPATIAL': '1'}),
        'int8_max': (model_bf16, vars_max,
                     dict(attention='packed', cache_dtype=jnp.int8),
                     {'HQT_INT8_DECODE': '1', 'HQT_INT8_STAGE2': '1',
                      'HQT_INT8_SPATIAL': '1'}),
    }

    if args.modes:
        keep = {'base'} | set(args.modes.split(','))
        unknown = keep - set(modes)
        assert not unknown, f'unknown modes {unknown}; known {list(modes)}'
        modes = {k: v for k, v in modes.items() if k in keep}

    samples = {}
    for name, (model, mvars, kw, env) in modes.items():
        os.environ.update(env)
        sampler = model.make_pixel_sampler(params=sp, **kw)
        outs = []
        for i in range(0, n, bs):
            key = jax.random.PRNGKey(1000 + i)   # same keys across modes
            px, _ = sampler(mvars, key, jnp.asarray(labels[i:i + bs]))
            outs.append(np.asarray(px, np.float32))
        samples[name] = np.concatenate(outs, axis=0)
        print(f'[sample] {name}: {samples[name].shape}', flush=True)

    # pixel-space Frechet stats (see PixelExtractor: random-init Inception
    # cannot rank distributions; this space orders color+structure)
    ex = PixelExtractor()
    feats = {name: ex.features(x) for name, x in samples.items()}
    stats = {name: mean_covar_numpy(f) for name, f in feats.items()}

    # training-set stats
    from hqtransformer_tpu.data.datasets import build_dataset
    ds = build_dataset('imagenet', os.path.join(wd, 'data'), 'train')
    tr_feats = []
    for i in range(len(ds)):
        img, _ = ds[i]
        tr_feats.append(np.asarray(img, np.float32))
    tr_feats = ex.features((np.stack(tr_feats) * 0.5 + 0.5).clip(0, 1))
    mu_t, sig_t = mean_covar_numpy(tr_feats)

    out = {'n_samples': n}
    mu_b, sig_b = stats['base']
    fid_base = frechet_distance(mu_t, sig_t, mu_b, sig_b)
    out['fid_proxy_base'] = round(fid_base, 4)
    for name in modes:
        if name == 'base':
            continue
        mu, sig = stats[name]
        out[f'fid_proxy_{name}'] = round(
            frechet_distance(mu_t, sig_t, mu, sig), 4)
        out[f'frechet_to_base_{name}'] = round(
            frechet_distance(mu_b, sig_b, mu, sig), 4)

    # paired bootstrap over samples: every mode was sampled with the SAME
    # keys/labels per index, so resampling one index set across all modes
    # cancels shared draw noise — the CI covers the MODE-induced delta
    # fid_proxy_<mode> - fid_proxy_base, the decision quantity ("does int8
    # serving degrade quality beyond estimator noise?")
    if args.bootstrap > 0:
        rng = np.random.RandomState(0)
        deltas = {name: [] for name in modes if name != 'base'}
        for _ in range(args.bootstrap):
            idx = rng.randint(0, n, n)
            mu_bb, sig_bb = mean_covar_numpy(feats['base'][idx])
            f_base = frechet_distance(mu_t, sig_t, mu_bb, sig_bb)
            for name in deltas:
                mu, sig = mean_covar_numpy(feats[name][idx])
                deltas[name].append(
                    frechet_distance(mu_t, sig_t, mu, sig) - f_base)
        for name, d in deltas.items():
            d = np.sort(np.asarray(d))
            lo, hi = d[int(0.025 * len(d))], d[int(0.975 * len(d)) - 1]
            out[f'delta_fid_{name}_ci95'] = [round(float(lo), 4),
                                             round(float(hi), 4)]
            out[f'delta_fid_{name}_mean'] = round(float(d.mean()), 4)
        out['bootstrap_draws'] = args.bootstrap

    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(line + '\n')


if __name__ == '__main__':
    main()
