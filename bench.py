#!/usr/bin/env python
"""Driver benchmark: class-conditional ImageNet-256 sampling throughput on
one chip, end-to-end (AR transformer loop + stage-1 pixel decode), on the
flagship HQ-Transformer L12 d=1536 configuration.

Mirrors the reference harness protocol (`measure_throughput/__main__.py`:
batch 50+, warmup loop, averaged timed loops, AR + decode both counted) but
as a single jit-compiled XLA program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

HEADLINE SERVING MODE: int8max — calibrated int8 KV cache + A8W8 gemms for
the depth chain, spatial steps and stage-1 decode. The reference itself
serves through reduced precision (fp16 autocast over its fp32-trained
model, `hierarchical_ar.py:445`); int8max is the TPU-native equivalent
choice, with committed quality evidence: flagship-shape token agreement +
per-step logit KL (docs/measurements/r5/int8_agreement_l12.json, embedded
below as `quality_evidence`) and bootstrap-CI Frechet deltas on a trained
model (docs/serving.md). The bf16 path remains fully measured in the
`bf16` field, and is the automatic fallback headline if the int8 section
fails. BENCH_HEADLINE=bf16 forces the old behavior.

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
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_SAMPLES_PER_SEC = 100.0
CONFIG = os.environ.get('BENCH_CONFIG', os.path.join(
    os.path.dirname(os.path.abspath(__file__)), 'configs', 'imagenet',
    'stage2', 'hqtransformer-l12-top8x8.yaml'))


def _emit(extra=None, value=0.0):
    """Print the one contract JSON line. Called exactly once per run."""
    out = {
        'metric': 'imagenet256_e2e_samples_per_sec_per_chip',
        'value': round(value, 3),
        'unit': 'samples/s',
        'vs_baseline': round(value / BASELINE_SAMPLES_PER_SEC, 3),
    }
    if extra:
        out.update(extra)
    print(json.dumps(out))
    sys.stdout.flush()


# best-so-far result: the primary metric is stashed here the moment it is
# measured, and every later best-effort section appends as it completes, so
# a failure/hang in a LATER section (watchdog fire, wedged lease mid-run)
# still emits the number already in hand instead of value 0
_RESULT = {'value': 0.0, 'extra': {}}


def _fail(reason, detail=''):
    """Emit a diagnosable artifact instead of a traceback, and exit 0 so the
    driver records the JSON line (round 3's number was lost to an rc=1
    traceback when the TPU relay was down at capture time). Carries any
    already-measured value/sections."""
    _emit({**_RESULT['extra'], 'error': reason, 'detail': str(detail)[:500]},
          value=_RESULT['value'])
    os._exit(0)


def _relay_probe(timeout=3.0):
    """True iff the axon TPU relay answers HTTP (any status, even an error
    page, means the listener is back; connection-refused means it is down)."""
    import urllib.error
    import urllib.request
    try:
        urllib.request.urlopen('http://127.0.0.1:8103/remote_compile',
                               timeout=timeout)
        return True
    except urllib.error.HTTPError:
        return True
    except Exception:
        return False


def _wait_for_backend():
    """Never touch the jax backend while the relay is down: client init then
    HANGS (not fails), and a killed TPU process can wedge the device lease.
    Poll the relay HTTP endpoint (pure socket, no jax) with a bounded budget;
    the outage is transient and nothing inside the container can restart it.

    Also arms a watchdog for the *first device op*: a relay that answers HTTP
    but has a wedged lease hangs even `jnp.ones` — after the budget we emit
    the error artifact and hard-exit rather than letting the driver time out
    with an empty record. Returns the disarm callback."""
    platforms = os.environ.get('JAX_PLATFORMS', '').lower()
    budget = float(os.environ.get('BENCH_BACKEND_WAIT_S', '600'))
    if 'axon' in platforms:
        deadline = time.time() + budget
        waited = False
        while not _relay_probe():
            waited = True
            if time.time() > deadline:
                _fail('backend_unavailable',
                      'axon TPU relay :8103 unreachable for '
                      f'{budget:.0f}s (connection refused)')
            print('bench: axon relay down, polling...', file=sys.stderr)
            time.sleep(15)
        if waited:
            print('bench: relay back up', file=sys.stderr)

    armed = threading.Event()
    armed.set()

    def watchdog():
        # a wedged lease can clear after tens of minutes (observed live on
        # 2026-08-19: HTTP up, ops hanging) — wait it out up to
        # BENCH_INIT_TIMEOUT_S before conceding with an artifact. The init
        # wait is DEDUCTED from the total run budget (run_watchdog below
        # measures from _START_TIME), so worst case the artifact lands at
        # max(init, total) seconds, not init + total.
        t = float(os.environ.get('BENCH_INIT_TIMEOUT_S', '2400'))
        waited = 0.0
        while waited < t:
            step = min(120.0, t - waited)
            time.sleep(step)
            waited += step
            if not armed.is_set():
                return
            print(f'bench: first device op still pending after '
                  f'{waited:.0f}s (wedged TPU lease?)', file=sys.stderr)
        if armed.is_set():
            _fail('backend_hang',
                  f'first device op did not complete in {t:.0f}s '
                  '(wedged TPU lease?)')

    threading.Thread(target=watchdog, daemon=True).start()
    return armed.clear


def main():
    start = time.time()
    disarm = _wait_for_backend()

    import jax
    import jax.numpy as jnp

    from hqtransformer_tpu.config import build_twostage_config
    from hqtransformer_tpu.models.twostage import (TwoStageModel,
                                                   serving_bf16_params)
    from hqtransformer_tpu.sampling.engine import SamplingParams

    try:
        jnp.zeros((), jnp.float32).block_until_ready()
    except Exception as e:
        _fail('backend_unavailable', repr(e))
    disarm()

    # whole-run watchdog: a TPU lease that wedges MID-run (or a compile that
    # never returns) must still leave a diagnosable artifact. The budget is
    # measured from process start, so time already burned waiting out a
    # wedged lease in _wait_for_backend counts against it.
    def run_watchdog():
        t = float(os.environ.get('BENCH_TOTAL_TIMEOUT_S', '5400'))
        time.sleep(max(0.0, t - (time.time() - start)))
        _fail('run_timeout', f'bench did not finish within {t:.0f}s')

    threading.Thread(target=run_watchdog, daemon=True).start()
    # bf16 batch sweep (v5e, 2026-08-18): 1536 → 432.8/s, 2048 → 428.1/s,
    # 3072 → OOM; 1536 is the measured optimum for the bf16 pipeline
    batch = int(os.environ.get('BENCH_BATCH', '1536'))
    n_seg = int(os.environ.get('BENCH_SEGMENTS', '4'))
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
                                           n_segments=n_seg)
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
    _RESULT['value'] = samples_per_sec
    _RESULT['extra']['serving'] = 'bf16'   # promoted below if int8 lands

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
            _RESULT['extra']['ms_per_sample_bs50_reference_protocol'] = \
                round(ref_ms_per_sample, 3)
            _RESULT['extra']['bs50_spread'] = round(ref_spread, 4)
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
                params=sp, cache_dtype=jnp.bfloat16, n_segments=n_seg)
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
            # NOTE decode_ms = e2e - ar assumes additivity: the pipelined
            # program decodes batch i-1 during batch i's AR loop, so XLA may
            # overlap the phases and skew the split. The floors below do NOT
            # depend on that split — only on the gemm inventories.
            dec_ms = e2e_ms - ar_ms
            phases = {
                'ar_ms_per_sample': round(ar_ms, 4),
                'decode_ms_per_sample': round(dec_ms, 4),
                'decomposition_note':
                    'decode_ms = e2e - ar (additivity assumed; pipelined '
                    'program may overlap phases)',
                'ar_gflop_per_sample': round(ar_gflop, 1),
                'ar_eff_tflops': round(ar_gflop / ar_ms, 1),
                'chip_bf16_tflops_peak': 197.0,
                # measured sustained rate of the AR gemm shapes (depth-chain
                # probes, scripts/ablate_ar.py); decode convs have been
                # measured ABOVE this (≈155 eff), so it bounds only AR
                'ar_gemm_tflops_measured_sustained': 142.0,
            }
            if dec_gflop is not None:
                # per-phase floors an outsider can check: AR flop at the
                # measured sustained gemm rate, decode flop at chip PEAK
                # (decode's measured effective rate exceeds the gemm
                # sustained figure, so peak is the only safe divisor).
                ar_floor = ar_gflop / 142.0
                dec_floor = dec_gflop / 197.0
                phases.update({
                    'decode_gflop_per_sample': dec_gflop,
                    'decode_eff_tflops': round(dec_gflop / dec_ms, 1),
                    'ar_floor_ms_at_sustained_gemm': round(ar_floor, 3),
                    'decode_floor_ms_at_peak': round(dec_floor, 3),
                    'e2e_floor_ms_per_sample': round(ar_floor + dec_floor, 3),
                    'e2e_bound_samples_per_sec': round(
                        1000.0 / (ar_floor + dec_floor), 1),
                })
            _RESULT['extra']['phases'] = phases
        except Exception as e:                      # pragma: no cover
            print(f'phase section skipped: {e!r}', file=sys.stderr)

    # int8 serving mode: calibrated int8 KV cache (halves the attention DMA
    # floor) + calibrated A8W8 stage-1 decode. Quality evidence:
    # scripts/serving_quality_delta.py (pixel-Frechet deltas vs the float
    # path on a trained model, committed in docs/serving.md). Best-effort —
    # never allowed to cost the primary metric.
    int8 = None
    if os.environ.get('BENCH_SKIP_INT8') != '1':
        try:
            cal_bs = min(batch, 256)
            key, k_cal = jax.random.split(key)
            v_q = model.calibrate_kv_scales(variables, k_cal,
                                            labels[:cal_bs], params=sp)
            ct = codes[0][:128].reshape(-1, model.top_res, model.top_res)
            from hqtransformer_tpu.models.stage2.hierarchical import \
                cells_to_raster
            r = model.top_res * model.cell_win
            cb = cells_to_raster(codes[1][:128], model.top_res,
                                 model.cell_win).reshape(-1, r, r)
            os.environ['HQT_INT8_DECODE'] = '1'
            v_q = model.calibrate_int8_decode(v_q, ct, cb)
            if os.environ.get('BENCH_INT8_STAGE2', '1') == '1':
                # also run the depth-chain gemms A8W8 — ON by default:
                # measured 2026-08-18 on the real chip, KV+decode+all-gemm
                # scopes = 589.4 samples/s vs 525.7 for KV+decode only,
                # with quality within ±0.5% of the float path (int8_max
                # row of scripts/serving_quality_delta.py, docs/serving.md)
                os.environ['HQT_INT8_STAGE2'] = '1'
                if os.environ.get('BENCH_INT8_SPATIAL', '1') == '1':
                    os.environ['HQT_INT8_SPATIAL'] = '1'
                n_cal = min(128, batch)
                v_q = model.calibrate_stage2_int8(
                    v_q, codes[0][:n_cal], cells_to_raster(
                        codes[1][:n_cal], model.top_res,
                        model.cell_win).reshape(n_cal, -1), labels[:n_cal])
            # int8 caches exist only in the packed layout, so force it
            # (the 'auto' heuristic declines non-TPU backends)
            sampler_q = model.make_pipelined_sampler(
                params=sp, cache_dtype=jnp.int8, n_segments=n_seg,
                attention=os.environ.get('BENCH_ATTENTION', 'packed'))
            # the int8 KV cache halves the dominant HBM resident, so the
            # int8 section may run at a LARGER batch than the bf16 primary
            # (calibration above is batch-independent: 128-row slices).
            # Default 2048 = the int8max measured optimum; an explicit
            # BENCH_BATCH override (smokes, sweeps) scales it down too.
            batch_q_default = batch if 'BENCH_BATCH' in os.environ else 2048
            batch_q = int(os.environ.get('BENCH_INT8_BATCH',
                                         str(batch_q_default)))
            labels_q = jnp.arange(batch_q, dtype=jnp.int32) % 1000
            key, k = jax.random.split(key)
            codes_q, px = sampler_q(v_q, k, labels_q, None)
            force(px)
            t_q = []
            for _ in range(n_loops):
                key, k = jax.random.split(key)
                t0 = time.perf_counter()
                codes_q, px = sampler_q(v_q, k, labels_q, codes_q)
                force(px)
                t_q.append(time.perf_counter() - t0)
            sps_q = batch_q / min(t_q)
            int8 = {'samples_per_sec': round(sps_q, 3),
                    'batch': batch_q,
                    'vs_bf16': round(sps_q / samples_per_sec, 3),
                    'vs_baseline': round(sps_q / BASELINE_SAMPLES_PER_SEC,
                                         3)}
            _RESULT['extra']['int8_serving'] = int8
            # PROMOTE int8max to the headline value (see module docstring):
            # the committed quality evidence rides along so the artifact is
            # self-contained
            if os.environ.get('BENCH_HEADLINE', 'int8max') != 'bf16':
                _RESULT['value'] = sps_q
                _RESULT['extra']['serving'] = 'int8max'
                _RESULT['extra']['bf16'] = {
                    'samples_per_sec': round(samples_per_sec, 3),
                    'batch': batch,
                    'vs_baseline': round(
                        samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3)}
                ev_path = os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), 'docs',
                    'measurements', 'r5', 'int8_agreement_l12.json')
                try:
                    ev = json.load(open(ev_path))
                    _RESULT['extra']['quality_evidence'] = {
                        k: ev[k] for k in (
                            'token_agreement_top', 'token_agreement_bot',
                            'kl_top_mean_nats', 'kl_bot_mean_nats',
                            'teacher_forced_top1_match',
                            'control_bf16_einsum_agreement_top',
                            'control_bf16_rounding_kl_top_mean',
                            'control_bf16_rounding_kl_bot_mean', 'batch')
                        if k in ev}
                    _RESULT['extra']['quality_evidence']['source'] = \
                        'docs/measurements/r5/int8_agreement_l12.json ' \
                        '(+ bootstrap-CI Frechet deltas in docs/serving.md)'
                except Exception:
                    _RESULT['extra']['quality_evidence'] = \
                        'docs/serving.md'
        except Exception as e:                      # pragma: no cover
            print(f'int8 section skipped: {e!r}', file=sys.stderr)
        finally:
            os.environ['HQT_INT8_DECODE'] = '0'
            os.environ['HQT_INT8_STAGE2'] = '0'
            os.environ['HQT_INT8_SPATIAL'] = '0'

    if ref_ms_per_sample is not None:
        _RESULT['extra']['ms_per_sample_bs50_reference_protocol'] = round(
            ref_ms_per_sample, 3)
        _RESULT['extra']['bs50_spread'] = round(ref_spread, 4)
    if phases is not None:
        _RESULT['extra']['phases'] = phases
    _emit(_RESULT['extra'], value=_RESULT['value'])


if __name__ == '__main__':
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:                      # pragma: no cover
        import traceback
        traceback.print_exc()
        _fail(type(e).__name__, e)
