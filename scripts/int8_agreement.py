#!/usr/bin/env python
"""Flagship-shape int8max serving-quality evidence: token-stream agreement
and per-step logit KL vs the bf16 serving path at L12 d=1536.

Two measurements on the SAME model (random weights are fine for numerics —
the gemm/quantization error model does not depend on trained values, and no
released checkpoints exist in this environment):

1. token agreement: sample the bf16 packed path and the int8max path
   (int8 KV + A8W8 depth/spatial gemms + everything measure_throughput's
   serving=int8max enables) from the SAME key; report the fraction of
   identical top/bottom tokens. Autoregressive divergence compounds, so
   this is the pessimistic end-to-end statement.
2. per-step logit KL: teacher-force BOTH serving paths on the bf16 path's
   sampled codes through engine.make_hierarchical_scorer (the exact serving
   decode machinery, parity-tested vs the training forward) and report
   KL(bf16 || int8max) of the per-position softmax at the serving
   temperature — the per-step perturbation BEFORE autoregressive
   compounding, the quantity that determines sample quality.

Mirrors the precedent the reference sets by serving through fp16 autocast
while training in fp32 (`hqvae/models/stage2/hierarchical_ar.py:445`).

    python scripts/int8_agreement.py [--batch 256] [--config ...]

Prints one JSON line; run on the TPU (bf16 path) — CPU works for smoke via
JAX_PLATFORMS=cpu + a tiny --config.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', default=os.path.join(
        REPO, 'configs', 'imagenet', 'stage2',
        'hqtransformer-l12-top8x8.yaml'))
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--temperature', type=float, default=0.95)
    ap.add_argument('--top-k', type=int, default=2048)
    ap.add_argument('--kl-chunk', type=int, default=64,
                    help='scorer batch chunk (logit tensors are large)')
    ap.add_argument('--out', default='')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hqtransformer_tpu.config import build_twostage_config
    from hqtransformer_tpu.models.stage2.hierarchical import cells_to_raster
    from hqtransformer_tpu.models.twostage import (TwoStageModel,
                                                   serving_bf16_params)
    from hqtransformer_tpu.sampling.engine import (SamplingParams,
                                                   make_hierarchical_sampler,
                                                   make_hierarchical_scorer)

    cfg = build_twostage_config(args.config)
    model = TwoStageModel(cfg, dtype=jnp.bfloat16)
    variables = model.init_variables(jax.random.PRNGKey(args.seed))
    variables = serving_bf16_params(variables)
    s2 = model.stage2
    Ttop = model.top_res * model.top_res
    B = args.batch
    labels = jnp.arange(B, dtype=jnp.int32) % s2.hparams.n_classes
    sp = SamplingParams(top_k_top=args.top_k, top_k_bot=args.top_k,
                        temperature_top=args.temperature,
                        temperature_bot=args.temperature)
    key = jax.random.PRNGKey(args.seed + 1)

    t0 = time.time()
    # --- bf16 reference stream
    ref = make_hierarchical_sampler(s2, Ttop, sp, attention='packed',
                                    cache_dtype=jnp.bfloat16)
    ct_f, cb_f = jax.block_until_ready(ref(variables['stage2'], key, labels))
    print(f'[bf16 sample] {time.time() - t0:.1f}s', flush=True)

    # --- calibrate the full int8max scope set on this model (the env flags
    # stay OFF here: calibration only sows absmax; the flags are read at
    # TRACE time by each sampler/scorer, so they are toggled tightly around
    # the int8 traces below — a stale '1' would poison the bf16 controls)
    cal = min(B, 256)
    vars_q = model.calibrate_kv_scales(variables, jax.random.PRNGKey(2),
                                       labels[:cal], params=sp)
    cb_raster = cells_to_raster(cb_f[:cal], model.top_res, model.cell_win
                                ).reshape(cal, -1)
    vars_q = model.calibrate_stage2_int8(vars_q, ct_f[:cal], cb_raster,
                                         labels[:cal])
    v2_f = variables['stage2']
    v2_q = vars_q['stage2']
    print(f'[calibrated] {time.time() - t0:.1f}s', flush=True)

    out = {'config': os.path.relpath(args.config, REPO), 'batch': B,
           'temperature': args.temperature, 'top_k': args.top_k,
           'embed_dim': s2.hparams.embed_dim,
           'n_layers': s2.hparams.n_layers,
           'backend': jax.default_backend()}

    # --- (1) token agreement at fixed seed
    os.environ['HQT_INT8_STAGE2'] = '1'
    os.environ['HQT_INT8_SPATIAL'] = '1'
    q8 = make_hierarchical_sampler(s2, Ttop, sp, attention='packed',
                                   cache_dtype=jnp.int8)
    ct_q, cb_q = jax.block_until_ready(q8(v2_q, key, labels))
    os.environ['HQT_INT8_STAGE2'] = '0'
    os.environ['HQT_INT8_SPATIAL'] = '0'
    out['token_agreement_top'] = round(float(np.mean(
        np.asarray(ct_q) == np.asarray(ct_f))), 4)
    out['token_agreement_bot'] = round(float(np.mean(
        np.asarray(cb_q) == np.asarray(cb_f))), 4)
    # agreement before any divergence: the first spatial cell
    out['first_cell_agreement_top'] = round(float(np.mean(
        np.asarray(ct_q[:, 0]) == np.asarray(ct_f[:, 0]))), 4)
    print(f'[agreement] {time.time() - t0:.1f}s '
          f'top={out["token_agreement_top"]} '
          f'bot={out["token_agreement_bot"]}', flush=True)

    # --- CONTROL: the same comparisons between two PURE-bf16 serving paths
    # (packed kernel vs einsum attention — rounding-level divergence only,
    # no quantization). With RANDOM weights the logits are near-flat over
    # 8192 classes, so ANY rounding-scale perturbation flips the
    # inverse-CDF draw and autoregressive divergence compounds — the
    # control pins how much of the raw agreement drop is that flatness
    # rather than int8. (On a TRAINED model, where distributions are
    # peaked, int8max token agreement measures 94-96%:
    # tests/test_int8_kv.py, docs/serving.md.)
    if os.environ.get('HQT_AGREEMENT_CONTROL', '1') == '1':
        ctl = make_hierarchical_sampler(s2, Ttop, sp, attention='einsum',
                                        cache_dtype=jnp.bfloat16)
        ct_c, cb_c = jax.block_until_ready(ctl(v2_f, key, labels))
        out['control_bf16_einsum_agreement_top'] = round(float(np.mean(
            np.asarray(ct_c) == np.asarray(ct_f))), 4)
        out['control_bf16_einsum_agreement_bot'] = round(float(np.mean(
            np.asarray(cb_c) == np.asarray(cb_f))), 4)
        print(f'[control] {time.time() - t0:.1f}s '
              f'top={out["control_bf16_einsum_agreement_top"]}', flush=True)

    # --- (2) per-step logit KL, teacher-forced on the bf16 codes
    scorer_f = make_hierarchical_scorer(s2, Ttop, attention='packed',
                                        cache_dtype=jnp.bfloat16)
    scorer_q = make_hierarchical_scorer(s2, Ttop, attention='packed',
                                        cache_dtype=jnp.int8)
    scorer_c = None
    if os.environ.get('HQT_AGREEMENT_CONTROL', '1') == '1':
        scorer_c = make_hierarchical_scorer(s2, Ttop, attention='einsum',
                                            cache_dtype=jnp.bfloat16)

    @jax.jit
    def kl_fn(lp, lq):
        # KL(softmax(lp/T) || softmax(lq/T)) per position, f32
        lp = lp.astype(jnp.float32) / args.temperature
        lq = lq.astype(jnp.float32) / args.temperature
        p = jax.nn.log_softmax(lp, -1)
        q = jax.nn.log_softmax(lq, -1)
        return jnp.sum(jnp.exp(p) * (p - q), axis=-1)

    kls_t, kls_b, top1 = [], [], []
    kls_ct, kls_cb = [], []
    cb_cells = cb_f  # sampler output is already [B, L, r] cell-local order
    for i in range(0, B, args.kl_chunk):
        sl = slice(i, i + args.kl_chunk)
        # HQT_INT8_* env vars are read at trace time inside the scorer; the
        # bf16 scorer must trace with them OFF
        os.environ['HQT_INT8_STAGE2'] = '0'
        os.environ['HQT_INT8_SPATIAL'] = '0'
        lt_f, lb_f = scorer_f(v2_f, labels[sl], ct_f[sl], cb_cells[sl])
        if scorer_c is not None:
            lt_c, lb_c = scorer_c(v2_f, labels[sl], ct_f[sl], cb_cells[sl])
            kls_ct.append(np.asarray(kl_fn(lt_f, lt_c)))
            kls_cb.append(np.asarray(kl_fn(lb_f, lb_c)))
        os.environ['HQT_INT8_STAGE2'] = '1'
        os.environ['HQT_INT8_SPATIAL'] = '1'
        lt_q, lb_q = scorer_q(v2_q, labels[sl], ct_f[sl], cb_cells[sl])
        kls_t.append(np.asarray(kl_fn(lt_f, lt_q)))
        kls_b.append(np.asarray(kl_fn(lb_f, lb_q)))
        top1.append(np.asarray(
            jnp.mean((jnp.argmax(lt_f, -1) == jnp.argmax(lt_q, -1))
                     .astype(jnp.float32))))
        print(f'[kl chunk {i}] {time.time() - t0:.1f}s', flush=True)
    os.environ['HQT_INT8_STAGE2'] = '0'
    os.environ['HQT_INT8_SPATIAL'] = '0'
    if kls_ct:
        ct_ = np.concatenate(kls_ct).ravel()
        cb_ = np.concatenate(kls_cb).ravel()
        out['control_bf16_rounding_kl_top_mean'] = round(float(ct_.mean()),
                                                         6)
        out['control_bf16_rounding_kl_bot_mean'] = round(float(cb_.mean()),
                                                         6)

    kt = np.concatenate(kls_t).ravel()
    kb = np.concatenate(kls_b).ravel()
    out.update({
        'kl_top_mean_nats': round(float(kt.mean()), 6),
        'kl_top_p50': round(float(np.percentile(kt, 50)), 6),
        'kl_top_p99': round(float(np.percentile(kt, 99)), 6),
        'kl_bot_mean_nats': round(float(kb.mean()), 6),
        'kl_bot_p50': round(float(np.percentile(kb, 50)), 6),
        'kl_bot_p99': round(float(np.percentile(kb, 99)), 6),
        'teacher_forced_top1_match': round(float(np.mean(top1)), 4),
        'wall_s': round(time.time() - t0, 1),
    })
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(line + '\n')


if __name__ == '__main__':
    main()
