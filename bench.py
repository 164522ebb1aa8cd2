#!/usr/bin/env python
"""Driver benchmark: class-conditional ImageNet-256 sampling throughput on
one chip, end-to-end (AR transformer loop + stage-1 pixel decode), on the
flagship HQ-Transformer L12 d=1536 configuration.

Mirrors the reference harness protocol (`measure_throughput/__main__.py`:
batch 50+, warmup loop, averaged timed loops, AR + decode both counted) but
as a single jit-compiled XLA program in bf16.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline anchor: the reference repo ships the throughput harness but no
committed numbers (SURVEY.md §6). We anchor at 100 samples/s/GPU (10 ms per
sample) — a deliberately generous estimate for the PyTorch reference (12
layers, bs 50, fp16, A100-class GPU; RQ/HQ family papers report 11-30 ms per
sample for comparable settings). vs_baseline = value / 100, so the >=5x
rebuild target (BASELINE.md) corresponds to vs_baseline >= 5.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from hqtransformer_tpu.config import build_twostage_config
from hqtransformer_tpu.models.twostage import (TwoStageModel,
                                               serving_bf16_params)
from hqtransformer_tpu.sampling.engine import SamplingParams

BASELINE_SAMPLES_PER_SEC = 100.0
CONFIG = os.environ.get('BENCH_CONFIG', os.path.join(
    os.path.dirname(os.path.abspath(__file__)), 'configs', 'imagenet',
    'stage2', 'hqtransformer-l12-top8x8.yaml'))


def main():
    batch = int(os.environ.get('BENCH_BATCH', '2048'))
    n_loops = int(os.environ.get('BENCH_LOOPS', '3'))

    cfg = build_twostage_config(CONFIG)
    model = TwoStageModel(cfg, dtype=jnp.bfloat16)
    variables = model.init_variables(jax.random.PRNGKey(0))
    # decode is HBM-bandwidth-bound on weights: store params in bf16 so each
    # of the 64 scan steps streams half the bytes (f32 master copies are a
    # training concern, not a sampling one)
    variables = serving_bf16_params(variables)

    sp = SamplingParams(top_k_top=2048, top_k_bot=2048,
                        temperature_top=0.95, temperature_bot=0.95)
    sampler = model.make_pipelined_sampler(params=sp,
                                           cache_dtype=jnp.bfloat16,
                                           n_segments=4)
    labels = jnp.arange(batch, dtype=jnp.int32) % 1000
    key = jax.random.PRNGKey(1)

    def force(x):
        # block_until_ready alone returns early on remote-tunneled backends
        # (axon); a scalar fetch guarantees completion
        x.block_until_ready()
        return float(jnp.sum(x[0, 0, :1].astype(jnp.float32)))

    # Steady-state software pipeline: each program call runs the AR loop
    # for batch i while decoding batch i-1's codes to pixels, so every
    # timed call emits exactly `batch` finished samples (the reference
    # harness likewise measures a steady loop over batches,
    # `measure_throughput/__main__.py:82-157`).
    key, k = jax.random.split(key)
    codes, pixels = sampler(variables, k, labels, None)   # warmup + prefill
    force(pixels)

    times = []
    for i in range(n_loops):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        codes, pixels = sampler(variables, k, labels, codes)
        force(pixels)
        times.append(time.perf_counter() - t0)

    dt = min(times)
    samples_per_sec = batch / dt

    # reference-protocol comparison point (measure_throughput/__main__.py:
    # 140-180: batch 50, 1000 samples per timed loop, AR + decode counted).
    # The reference's CUDA harness queues its 20 bs-50 generations
    # asynchronously and syncs once per loop; the XLA equivalent is ONE
    # program scanning 20 sequential bs-50 generations, which also
    # amortizes this tunnel's ~48 ms fixed dispatch cost to 0.05 ms/sample.
    # 5 timed loops, median reported with spread. Best-effort — never
    # allowed to cost the primary metric (extra compile, OOM, etc.)
    ref_ms_per_sample = ref_spread = None
    if os.environ.get('BENCH_SKIP_BS50') != '1':
        try:
            n_b, bs50 = 20, 50
            sampler50 = model.make_pixel_sampler(params=sp,
                                                 cache_dtype=jnp.bfloat16)

            @jax.jit
            def protocol_loop(variables, key, labels):   # labels [n_b, bs50]
                def body(key, lab):
                    key, k = jax.random.split(key)
                    pixels, _ = sampler50(variables, k, lab)
                    # full-pixel reduction: keeps every decode op live
                    # without stacking n_b * bs50 images in HBM
                    return key, jnp.sum(pixels.astype(jnp.float32))
                key, sums = jax.lax.scan(body, key, labels)
                return sums

            labels50 = (jnp.arange(n_b * bs50, dtype=jnp.int32)
                        % 1000).reshape(n_b, bs50)
            key, k = jax.random.split(key)
            s = protocol_loop(variables, k, labels50)
            s.block_until_ready()
            float(jnp.sum(s))                            # force via fetch
            t50 = []
            for _ in range(5):
                key, k = jax.random.split(key)
                t0 = time.perf_counter()
                s = protocol_loop(variables, k, labels50)
                s.block_until_ready()
                float(jnp.sum(s))
                t50.append(time.perf_counter() - t0)
            t50.sort()
            med = t50[len(t50) // 2]
            ref_ms_per_sample = med / (n_b * bs50) * 1000
            ref_spread = (t50[-1] - t50[0]) / med
        except Exception as e:                      # pragma: no cover
            print(f'bs50 protocol section skipped: {e!r}', file=sys.stderr)

    # per-phase decomposition + effective-TFLOP/s roofline: times the AR
    # loop alone (one extra compile); decode = e2e - ar. FLOP counts are
    # the gemm inventory of the flagship shapes (docs/ROOFLINE in README).
    phases = None
    if os.environ.get('BENCH_SKIP_PHASES') != '1':
        try:
            from hqtransformer_tpu.sampling.engine import \
                make_hierarchical_sampler
            # identical sampler configuration to the e2e path above
            # (max_seq_len, segments) so dec_ms = e2e - ar is a true
            # decomposition and the probe tracks BENCH_CONFIG overrides
            ar = make_hierarchical_sampler(
                model.stage2, max_seq_len=model.top_res * model.top_res,
                params=sp, cache_dtype=jnp.bfloat16, n_segments=4)
            v2 = variables['stage2']
            c = ar(v2, key, labels)
            jax.block_until_ready(c)
            float(jnp.sum(c[0][:1, :1].astype(jnp.float32)))
            t_ar = []
            for _ in range(max(2, n_loops)):
                key, k = jax.random.split(key)
                t0 = time.perf_counter()
                c = ar(v2, k, labels)
                jax.block_until_ready(c)
                float(jnp.sum(c[0][:1, :1].astype(jnp.float32)))
                t_ar.append(time.perf_counter() - t0)
            ar_ms = min(t_ar) / batch * 1000
            e2e_ms = dt / batch * 1000
            from hqtransformer_tpu.config import parse_embedding_type
            hp = model.stage2.hparams
            D, L = hp.embed_dim, hp.n_layers
            Ld = model.stage2.hpd.n_layers
            r = model.stage2.ratio_bot2top
            steps = model.top_res * model.top_res   # spatial AR steps
            emb = parse_embedding_type(hp.embedding_type)
            le = emb.n_layers_emb if emb.kind in ('transformer',
                                                  'bidirectional') else 0
            vt, vb = model.stage2.vocab_size_top, model.stage2.vocab_size_bot
            # per-sample gemm MACs x2: cell-embedding transformer ((1+r)
            # tokens x 12D^2/layer), spatial 12D^2/layer/step, depth stack
            # first (11D^2) + second (r tokens x 12D^2) per layer, heads
            ar_gflop = steps * (le * (1 + r) * 12 * D * D +
                                L * 12 * D * D +
                                Ld * (11 * D * D + r * 12 * D * D) +
                                D * vt + r * D * vb) * 2 / 1e9
            # stage-1 decode FLOPs: XLA-counted via
            # jit(decode).lower(...).compile().cost_analysis() = 174.8
            # GF/sample at the FLAGSHIP stage-1 decoder (all three imagenet
            # stage-2 configs share it). A BENCH_CONFIG with a different
            # stage-1 gets no decode/roofline figures rather than wrong ones.
            flagship = build_twostage_config(os.path.join(
                os.path.dirname(os.path.abspath(__file__)), 'configs',
                'imagenet', 'stage2', 'hqtransformer-l12-top8x8.yaml'))
            dec_gflop = 174.8 if cfg.stage1 == flagship.stage1 else None
            dec_ms = e2e_ms - ar_ms
            phases = {
                'ar_ms_per_sample': round(ar_ms, 4),
                'decode_ms_per_sample': round(dec_ms, 4),
                'ar_gflop_per_sample': round(ar_gflop, 1),
                'ar_eff_tflops': round(ar_gflop / ar_ms, 1),
                'chip_bf16_tflops_peak': 197.0,
                'chip_bf16_tflops_measured_sustained': 142.0,
            }
            if dec_gflop is not None:
                phases.update({
                    'decode_gflop_per_sample': dec_gflop,
                    'decode_eff_tflops': round(dec_gflop / dec_ms, 1),
                    # the bound this proves: even at 100% of the measured
                    # sustained gemm rate for EVERY flop, e2e ms/sample >=
                    # (ar_gflop + dec_gflop)/142 — the model's inherent work
                    'roofline_ms_per_sample_at_sustained': round(
                        (ar_gflop + dec_gflop) / 142.0, 3),
                    'roofline_samples_per_sec_at_sustained': round(
                        1000.0 / ((ar_gflop + dec_gflop) / 142.0), 1),
                })
        except Exception as e:                      # pragma: no cover
            print(f'phase section skipped: {e!r}', file=sys.stderr)

    out = {
        'metric': 'imagenet256_e2e_samples_per_sec_per_chip',
        'value': round(samples_per_sec, 3),
        'unit': 'samples/s',
        'vs_baseline': round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
    }
    if ref_ms_per_sample is not None:
        out['ms_per_sample_bs50_reference_protocol'] = round(
            ref_ms_per_sample, 3)
        out['bs50_spread'] = round(ref_spread, 4)
    if phases is not None:
        out['phases'] = phases
    print(json.dumps(out))


if __name__ == '__main__':
    main()
