#!/usr/bin/env python
"""Sampling-throughput harness — the `measure_throughput` surface of the
reference (`/root/reference/measure_throughput/__main__.py:51-186`),
TPU-native.

Same protocol: batches of `batch_size`, ~1000 samples per loop, `n_loop`
loops with `warmup` discarded, reporting ms/sample split into AR vs stage-1
decode. Because the TPU pipeline fuses both phases into one XLA program, the
split is measured by also timing a codes-only sampler (AR phase) and
attributing the remainder to decode.

  python measure_throughput.py model_path=<cfg.yaml> batch_size=50 n_loop=6
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.twostage import (TwoStageModel,
                                               load_serving_scales,
                                               save_serving_scales,
                                               serving_bf16_params)
from hqtransformer_tpu.sampling.engine import (SamplingParams,
                                               make_hierarchical_sampler,
                                               make_multilevel_sampler)


def parse_kv_args(argv):
    cfg = dict(model_path='', batch_size=50, n_loop=6, warmup=1,
               top_resolution=8, code_levels=2, dtype='bfloat16',
               cond='cls',  # cls | txt (the measure_throughput_txt variant)
               samples_per_loop=1000,  # reference protocol value; lower it
                                       # only for CI smoke runs
               serving='bf16',  # bf16 | int8 (calibrated int8 KV cache +
                                # A8W8 decode) | int8max (int8 + A8W8
                                # depth-chain AND spatial gemms); bf16
                                # 2- and 3-level models, cls and txt cond
                                # — quality table: docs/serving.md
               scales_out='',   # int8 modes: CALIBRATE ONLY — write the
                                # serving-scale artifact here and exit
               scales_in='',    # int8 modes: load a scales_out artifact
                                # and skip in-process calibration (the
                                # production PTQ split — and the only form
                                # whose measurement process is as lean as
                                # the bf16 rows'; the fused
                                # calibrate-then-measure process
                                # RESOURCE_EXHAUSTED the 16 GB chip at
                                # EVERY batch size, docs/serving.md)
               profile='')  # dir for a jax.profiler trace of one loop
    for a in argv:
        k, v = a.split('=', 1)
        cfg[k] = type(cfg.get(k, v))(v) if k in cfg else v
    return cfg


def _calibrate_int8(a, model, cfg, variables, bs, Ttop):
    """Calibrated int8 serving scales (KV cache + A8W8 decode; int8max adds
    the depth-chain and spatial gemms): one representative sampling pass +
    absmax collection passes. Returns `variables` extended with the scale
    collections (docs/serving.md)."""
    def mark(stage):
        print(f'[cal +{time.perf_counter() - t0:.0f}s] {stage}', flush=True)

    t0 = time.perf_counter()
    if a['cond'] == 'txt':
        cal_labels = jnp.zeros(
            (min(bs, 256), cfg.stage2.hparams.ctx_len_txt), jnp.int32)
    else:
        cal_labels = jnp.zeros((min(bs, 256),), jnp.int32)
    variables = model.calibrate_kv_scales(
        variables, jax.random.PRNGKey(2), cal_labels, max_seq_len=Ttop)
    mark('kv scales done')
    os.environ['HQT_INT8_DECODE'] = '1'
    tr = model.top_res
    if a['code_levels'] == 2:
        _, (ct0, cb0) = model.make_pixel_sampler(max_seq_len=Ttop)(
            variables, jax.random.PRNGKey(3), cal_labels)
        # scalar fetch: force this e2e program NOW so its buffers release
        # before the decode-calibration queues (async dispatch; see
        # twostage.calibrate_int8_decode)
        float(jnp.sum(ct0[:1, :1]))
        mark('calibration sampler done')
        from hqtransformer_tpu.models.stage2.hierarchical import \
            cells_to_raster
        r = tr * model.cell_win
        variables = model.calibrate_int8_decode(
            variables, ct0.reshape(-1, tr, tr),
            cells_to_raster(cb0, tr, model.cell_win).reshape(-1, r, r))
        # gemm-scale calibration runs the TRAINING forward, which
        # materializes full per-level logits — a small slice suffices
        # for absmax scales (level-3 logits at 256 samples are ~8 GB:
        # the OOM behind the first l12-level3-int8max row attempt)
        nc = min(64, ct0.shape[0])
        forward_codes = (ct0[:nc], cells_to_raster(
            cb0[:nc], tr, model.cell_win).reshape(nc, -1),
            cal_labels[:nc])
    else:
        _, (t0_, m0_, b0_) = model.make_pixel_sampler_multilevel(
            max_seq_len=Ttop)(variables, jax.random.PRNGKey(3),
                              cal_labels)
        float(jnp.sum(t0_[:1, :1]))  # force (async dispatch; see above)
        mark('calibration sampler done')
        from hqtransformer_tpu.models.stage2.multilevel import \
            cells_to_level
        mid_map = cells_to_level(m0_, tr, 2)    # [B, (2tr 2tr)] raster
        bot_map = cells_to_level(b0_, tr, 4)
        variables = model.calibrate_int8_decode(
            variables, [t0_.reshape(-1, tr, tr),
                        mid_map.reshape(-1, tr * 2, tr * 2),
                        bot_map.reshape(-1, tr * 4, tr * 4)])
        nc = min(32, t0_.shape[0])
        forward_codes = ([t0_[:nc], mid_map[:nc], bot_map[:nc]],
                         cal_labels[:nc])
    mark('decode scales done')
    if a['serving'] == 'int8max':
        # + A8W8 depth-chain and spatial transformer gemms (calibrated
        # static scales; quality table in docs/serving.md)
        os.environ['HQT_INT8_STAGE2'] = '1'
        os.environ['HQT_INT8_SPATIAL'] = '1'
        variables = model.calibrate_stage2_int8(variables, *forward_codes)
        mark('stage2 gemm scales done')
    return variables


def main():
    a = parse_kv_args(sys.argv[1:])
    cfg = build_twostage_config(a['model_path'])
    dtype = jnp.bfloat16 if a['dtype'] == 'bfloat16' else jnp.float32
    model = TwoStageModel(cfg, dtype=dtype)
    variables = model.init_variables(jax.random.PRNGKey(0))
    if dtype == jnp.bfloat16:
        # serving convention shared with bench.py — without this, L42
        # (1.38B params) holds 5.5 GB f32 + 2.75 GB hoisted bf16 copies
        # and OOMs at batch 512
        variables = serving_bf16_params(variables)

    n2 = sum(x.size for x in jax.tree.leaves(variables['stage2']))
    print(f'bs{a["batch_size"]}, sampling loops '
          f'{a["warmup"] + 1}-{a["n_loop"]}')
    print(f'python {sys.version.split()[0]}, jax {jax.__version__}, '
          f'devices {jax.devices()}')
    print(f'transformer size: {n2 / 1e6:.1f}M')

    bs = a['batch_size']
    n_iter = (a['samples_per_loop'] + bs - 1) // bs
    Ttop = a['top_resolution'] ** 2

    cache_dtype = dtype
    if a['serving'] in ('int8', 'int8max'):
        assert dtype == jnp.bfloat16, 'serving=int8 needs dtype=bfloat16'
        cache_dtype = jnp.int8
        if a['scales_in']:
            # production PTQ split: scales were calibrated by a separate
            # `scales_out=` process; this process compiles ONLY the two
            # measurement programs (same process shape as the bf16 rows,
            # which run up to batch 2048 on the 16 GB chip)
            variables = load_serving_scales(variables, a['scales_in'])
            os.environ['HQT_INT8_DECODE'] = '1'
            if a['serving'] == 'int8max':
                os.environ['HQT_INT8_STAGE2'] = '1'
                os.environ['HQT_INT8_SPATIAL'] = '1'
        else:
            variables = _calibrate_int8(a, model, cfg, variables, bs, Ttop)
            if a['scales_out']:
                save_serving_scales(variables, a['scales_out'])
                print(f'wrote serving scales: {a["scales_out"]}')
                return
            # fused calibrate-then-measure (legacy; kept for one-process
            # use at SMALL batch): drop the calibration executables before
            # compiling the measurement programs. Known to RESOURCE_EXHAUST
            # the 16 GB chip at every batch for the flagship configs — use
            # the scales_out/scales_in split there (docs/serving.md).
            jax.clear_caches()
    # int8 caches exist only in the packed layout, so force it there
    attn = 'packed' if a['serving'] in ('int8', 'int8max') else 'auto'

    def make_ar():
        if a['code_levels'] == 2:
            return make_hierarchical_sampler(
                model.stage2, Ttop, SamplingParams(),
                cache_dtype=cache_dtype, attention=attn)
        return make_multilevel_sampler(model.stage2, Ttop,
                                       cache_dtype=cache_dtype,
                                       attention=attn)

    def make_e2e():
        if a['code_levels'] == 2:
            return model.make_pixel_sampler(max_seq_len=Ttop,
                                            cache_dtype=cache_dtype,
                                            attention=attn)
        return model.make_pixel_sampler_multilevel(
            max_seq_len=Ttop, cache_dtype=cache_dtype, attention=attn)

    if a['cond'] == 'txt':
        labels = jnp.zeros((bs, cfg.stage2.hparams.ctx_len_txt), jnp.int32)
    else:
        labels = jnp.zeros((bs,), jnp.int32)
    key = jax.random.PRNGKey(1)

    # The two phases are measured in SEQUENCE (all AR loops, release, then
    # all e2e loops) rather than interleaved: each phase's executable (and
    # its KV-cache/decode-activation arena) then lives alone on the chip —
    # the interleaved form held both and RESOURCE_EXHAUSTED the l12 int8
    # family rows at bs>=1536. Per-phase timings and the decode = e2e - ar
    # split are unchanged (the reference also times the phases separately,
    # `measure_throughput/__main__.py:140-180`).
    def timed_loops(run, label):
        nonlocal key
        ts = []
        print('-' * 80)
        for loop_idx in range(a['n_loop']):
            t = 0.0
            for _ in range(n_iter):
                key, k1 = jax.random.split(key)
                t0 = time.perf_counter()
                run(k1, labels)
                t += time.perf_counter() - t0
            per = t / (n_iter * bs) * 1000
            print(f'{loop_idx + 1}/{a["n_loop"]} | {label}: '
                  f'{per:.3f} ms/sample', flush=True)
            if loop_idx >= a['warmup']:
                ts.append(per)
        return ts

    ar_sampler = make_ar()

    def run_ar(key, labels):
        out = ar_sampler(variables['stage2'], key, labels)
        # scalar fetch: block_until_ready returns early on tunneled backends
        return float(jnp.sum(jax.tree.leaves(out)[0][0, :1]))

    run_ar(key, labels)   # compile
    if a['profile']:
        with jax.profiler.trace(a['profile']):
            key, k1 = jax.random.split(key)
            run_ar(k1, labels)
    speeds_ar = timed_loops(run_ar, 'ar')
    del ar_sampler, run_ar
    jax.clear_caches()

    e2e_sampler = make_e2e()

    def run_e2e(key, labels):
        pixels, _ = e2e_sampler(variables, key, labels)
        return float(jnp.sum(pixels[0, 0, :1].astype(jnp.float32)))

    run_e2e(key, labels)  # compile
    if a['profile']:
        with jax.profiler.trace(a['profile']):
            key, k2 = jax.random.split(key)
            run_e2e(k2, labels)
        print(f'profiler trace written to {a["profile"]}')
    speeds = timed_loops(run_e2e, 'e2e')

    speeds_decode = [max(0.0, e - r) for e, r in zip(speeds, speeds_ar)]
    print('-' * 80)
    n = len(speeds)
    print(f'bs{bs} | {sum(speeds) / n:.4f} ms/sample '
          f'(ar: {sum(speeds_ar) / n:.4f}, '
          f'decode: {sum(speeds_decode) / n:.4f})')
    print('=' * 80)


if __name__ == '__main__':
    main()
