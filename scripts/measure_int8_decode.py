#!/usr/bin/env python
"""Quality + speed of the A8W8 int8 stage-1 decode (HQT_INT8_DECODE=1)
against the bf16 decode on the flagship shapes.

The int8 path quantizes conv activations per-tensor and weights
per-output-channel, accumulating int32 on the MXU
(models/stage1/layers.py::QuantizableConv). The reference has no int8
path (it decodes under fp16 autocast); this is an opt-in serving mode,
so its evidence is a PSNR against the bf16 decode plus the throughput
delta.

Usage: python scripts/measure_int8_decode.py [--batch 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=512)
    ap.add_argument('--config', default=os.path.join(
        os.path.dirname(__file__), '..', 'configs', 'imagenet', 'stage2',
        'hqtransformer-l12-top8x8.yaml'))
    ap.add_argument('--chunk', type=int, default=128)
    args = ap.parse_args()

    results = {}
    for mode in ('bf16', 'int8', 'int8-static'):
        # fresh process-level flag BEFORE tracing
        os.environ['HQT_INT8_DECODE'] = '0' if mode == 'bf16' else '1'
        import importlib
        import jax
        import jax.numpy as jnp
        from hqtransformer_tpu.config import build_twostage_config
        from hqtransformer_tpu.models.twostage import TwoStageModel

        cfg = build_twostage_config(args.config)
        model = TwoStageModel(cfg, dtype=jnp.bfloat16)
        variables = model.init_variables(jax.random.PRNGKey(0))
        B = args.batch
        ct = jax.random.randint(jax.random.PRNGKey(1), (B, 8, 8), 0,
                                model.stage2.vocab_size_top)
        cb = jax.random.randint(jax.random.PRNGKey(2), (B, 16, 16), 0,
                                model.stage2.vocab_size_bot)

        from hqtransformer_tpu.models.stage1.layers import int8_decode_scope

        if mode == 'int8-static':
            # calibrated scales: the dynamic per-conv max reduction (and
            # its serialization barrier) disappears from the decode
            variables = model.calibrate_int8_decode(
                variables, ct[:min(64, B)], cb[:min(64, B)])

        @jax.jit
        def run(variables, ct, cb):
            def dec(a):
                px = model.stage1.apply(variables['stage1'], *a,
                                        method=type(model.stage1).decode_code)
                return jnp.clip(px * 0.5 + 0.5, 0.0, 1.0)
            n = B // args.chunk
            with int8_decode_scope():   # serving-decode gate (layers.py)
                return jax.lax.map(dec, (ct.reshape(n, args.chunk, 8, 8),
                                         cb.reshape(n, args.chunk, 16, 16)))

        px = run(variables, ct, cb)
        jax.block_until_ready(px)
        float(jnp.sum(px[0, 0, 0, 0].astype(jnp.float32)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            px = run(variables, ct, cb)
            jax.block_until_ready(px)
            float(jnp.sum(px[0, 0, 0, 0].astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        px = np.asarray(px, np.float32)       # [n_chunks, chunk, H, W, 3]
        px = px.reshape(B, *px.shape[2:])
        print(f'{mode}: {min(ts) / B * 1000:.3f} ms/sample')
        if mode == 'bf16':
            # keep only the reference pixels; compare the quantized modes
            # inline (each mode's array is ~400 MB at the default batch)
            results['bf16'] = (px, min(ts))
        else:
            mse = float(((results['bf16'][0] - px) ** 2).mean())
            psnr = 10 * np.log10(1.0 / max(mse, 1e-12))   # range [0, 1]
            print(f'{mode} vs bf16: PSNR {psnr:.1f} dB  mse {mse:.2e}  '
                  f'speedup {results["bf16"][1] / min(ts):.2f}x')


if __name__ == '__main__':
    main()
