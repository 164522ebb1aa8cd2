#!/usr/bin/env python
"""Device-memory walk of the int8 serving calibration sequence — the
post-mortem instrument for the fused calibrate-then-measure OOM
(measure_throughput.py scales_in docstring; every fused int8/int8max
family row RESOURCE_EXHAUSTED the 16 GB chip, even at batch 256, while
the two-process split runs at the bf16 batches).

Prints `memory_stats()` (when the backend exposes it) plus a live-buffer
census (jax.live_arrays) after each stage, so the lingering resident is
attributable: calibration executables, constant-folded weight copies, or
live arrays.

    python scripts/diag_int8_mem.py [batch] [serving]   # default 256 int8max
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def report(tag):
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception as e:
        stats = None
        err = repr(e)
    if stats:
        used = stats.get('bytes_in_use', 0) / 2**30
        peak = stats.get('peak_bytes_in_use', 0) / 2**30
        print(f'[mem] {tag}: in_use {used:.2f} GiB, peak {peak:.2f} GiB',
              flush=True)
    else:
        print(f'[mem] {tag}: memory_stats unavailable ({err})', flush=True)
    live = jax.live_arrays()
    by_bytes = sum(a.size * a.dtype.itemsize for a in live) / 2**30
    print(f'[live] {tag}: {len(live)} arrays, {by_bytes:.2f} GiB '
          f'(host-tracked)', flush=True)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    serving = sys.argv[2] if len(sys.argv) > 2 else 'int8max'
    sys.argv = [sys.argv[0]]  # keep measure_throughput's parser out of it

    from measure_throughput import _calibrate_int8, parse_kv_args
    from hqtransformer_tpu.config import build_twostage_config
    from hqtransformer_tpu.models.twostage import (TwoStageModel,
                                                   serving_bf16_params)
    from hqtransformer_tpu.sampling.engine import (SamplingParams,
                                                   make_hierarchical_sampler)

    a = parse_kv_args([
        'model_path=configs/imagenet/stage2/hqtransformer-l12-top8x8.yaml',
        f'batch_size={bs}', f'serving={serving}'])
    cfg = build_twostage_config(a['model_path'])
    model = TwoStageModel(cfg, dtype=jnp.bfloat16)
    variables = model.init_variables(jax.random.PRNGKey(0))
    variables = serving_bf16_params(variables)
    jax.block_until_ready(jax.tree.leaves(variables)[0])
    report('init+bf16 params')

    Ttop = model.top_res * model.top_res
    variables = _calibrate_int8(a, model, cfg, variables, bs, Ttop)
    jax.block_until_ready(jax.tree.leaves(variables)[0])
    report('after calibration')

    jax.clear_caches()
    report('after clear_caches')

    sampler = make_hierarchical_sampler(
        model.stage2, Ttop, SamplingParams(), cache_dtype=jnp.int8,
        attention='packed')
    labels = jnp.zeros((bs,), jnp.int32)
    out = sampler(variables['stage2'], jax.random.PRNGKey(1), labels)
    print('ar head', float(jnp.sum(jax.tree.leaves(out)[0][0, :1])),
          flush=True)
    report('after int8 AR compile+run')
    print('diag OK', flush=True)


if __name__ == '__main__':
    main()
