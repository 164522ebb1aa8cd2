#!/usr/bin/env python
"""Machine-checkable family benchmark: run `measure_throughput.py` over the
reference's released-checkpoint model family (the exact models of its FID
table, `/root/reference/checkpoints/README.md:6-8`, plus the 3-level
flagship and the FFHQ/CC15M variants) and write the results to PERF.json
at the repo root — the artifact form of the README's family table.

    python scripts/bench_family.py [--rows l12,l24] [--out PERF.json]
    python scripts/bench_family.py --samples-per-loop 100   # CI smoke

Each PERF.json entry: {"model", "config", "batch", "cond", "code_levels",
"ms_per_sample", "ar_ms", "decode_ms", "samples_per_sec"}. Serialize runs
(one chip; concurrent jobs queue and distort timings).
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = {
    # name: (config, batch, cond, code_levels[, serving])
    'l12': ('configs/imagenet/stage2/hqtransformer-l12-top8x8.yaml',
            2048, 'cls', 2),
    # int8 rows calibrate in a separate process (run_row two-process PTQ
    # split) so the measurement process is as lean as the bf16 rows' — the
    # fused calibrate-then-measure form RESOURCE_EXHAUSTED the 16 GB chip
    # at EVERY batch (2026-08-19). The int8 KV cache halves the dominant
    # HBM resident, so these start at the bf16 batches; an OOM row
    # auto-retries at half batch (run_row).
    'l12-int8': ('configs/imagenet/stage2/hqtransformer-l12-top8x8.yaml',
                 2048, 'cls', 2, 'int8'),
    'l12-int8max': ('configs/imagenet/stage2/hqtransformer-l12-top8x8.yaml',
                    2048, 'cls', 2, 'int8max'),
    'l24': ('configs/imagenet/stage2/hqtransformer-l24-top8x8.yaml',
            1024, 'cls', 2),
    'l24-int8max': ('configs/imagenet/stage2/hqtransformer-l24-top8x8.yaml',
                    1024, 'cls', 2, 'int8max'),
    'l42': ('configs/imagenet/stage2/hqtransformer-l42-top8x8.yaml',
            384, 'cls', 2),
    'l42-int8max': ('configs/imagenet/stage2/hqtransformer-l42-top8x8.yaml',
                    384, 'cls', 2, 'int8max'),
    'l12-level3': ('configs/imagenet/stage2/'
                   'hqtransformer-l12-top8x8-level3.yaml', 256, 'cls', 3),
    'l12-level3-int8max': ('configs/imagenet/stage2/'
                           'hqtransformer-l12-top8x8-level3.yaml',
                           256, 'cls', 3, 'int8max'),
    'l24-ffhq': ('configs/ffhq/stage2/hqtransformer-l24-ffhq.yaml',
                 1024, 'cls', 2),
    'l12-cc15m-txt': ('configs/cc15m/stage2/hqtransformer-l12-cc15m.yaml',
                      1024, 'txt', 2),
    'l12-cc15m-txt-int8max': ('configs/cc15m/stage2/'
                              'hqtransformer-l12-cc15m.yaml',
                              1024, 'txt', 2, 'int8max'),
    # apples-to-apples reference-protocol point: the reference harness runs
    # bs=50 (`/root/reference/measure_throughput/__main__.py:140-180`);
    # every other row uses TPU-serving batches
    'l12-bs50': ('configs/imagenet/stage2/hqtransformer-l12-top8x8.yaml',
                 50, 'cls', 2),
}

SUMMARY_RE = re.compile(
    r'bs(\d+) \| ([\d.]+) ms/sample \(ar: ([\d.]+), decode: ([\d.]+)\)')


OOM_MARKERS = ('RESOURCE_EXHAUSTED', 'Ran out of memory')


def _write_row_log(tag, stdout, stderr):
    log_dir = os.environ.get('BENCH_ROW_LOG_DIR')
    if not log_dir:
        return
    os.makedirs(log_dir, exist_ok=True)
    def _s(x):
        return x.decode(errors='replace') if isinstance(x, bytes) \
            else (x or '')
    with open(os.path.join(log_dir, f'{tag}.log'), 'w') as f:
        f.write(_s(stdout))
        f.write('\n--- stderr ---\n')
        f.write(_s(stderr))


def run_row(name, config, batch, cond, code_levels, samples_per_loop,
            n_loop, serving='bf16', _tries=2, _scales=None):
    base = [sys.executable, 'measure_throughput.py',
            f'model_path={config}', f'cond={cond}',
            f'code_levels={code_levels}']
    row_timeout = float(os.environ.get('BENCH_ROW_TIMEOUT_S', '3300'))
    cal_wall = None
    if (serving != 'bf16' and _scales is None
            and os.environ.get('BENCH_INT8_TWO_PROC', '1') == '1'):
        # int8 rows calibrate in a SEPARATE process (the production PTQ
        # split, measure_throughput scales_out/scales_in): the measurement
        # process then compiles only its two programs, same process shape
        # as the bf16 rows. The fused calibrate-then-measure process
        # RESOURCE_EXHAUSTED the 16 GB chip at every batch (2026-08-19).
        scales = os.path.join(tempfile.gettempdir(),
                              f'hqt_scales_{name}.pkl')
        cal = base + [f'batch_size={min(batch, 256)}',
                      f'serving={serving}', f'scales_out={scales}']
        tc = time.time()
        try:
            pc = subprocess.run(cal, cwd=REPO, capture_output=True,
                                text=True, timeout=row_timeout)
        except subprocess.TimeoutExpired as e:
            _write_row_log(f'{name}.cal.timeout', e.output, e.stderr)
            return {'model': name, 'config': config, 'batch': batch,
                    'error': 'calibration timeout',
                    'detail': f'calibration exceeded {row_timeout}s'}
        cal_wall = round(time.time() - tc, 1)
        _write_row_log(f'{name}.cal', pc.stdout, pc.stderr)
        if pc.returncode != 0 or not os.path.exists(scales):
            return {'model': name, 'config': config, 'batch': batch,
                    'error': f'calibration rc={pc.returncode}',
                    'detail': (pc.stderr or pc.stdout)[-500:]}
        _scales = scales
    argv = base + [f'batch_size={batch}', f'n_loop={n_loop}',
                   f'samples_per_loop={samples_per_loop}',
                   f'serving={serving}']
    if _scales:
        argv.append(f'scales_in={_scales}')
    t0 = time.time()
    # inner timeout deliberately below the queue's shell timeout so a hung
    # row is reaped HERE (partial PERF.json still written) rather than the
    # whole process being SIGTERM'd from outside. Queues running under a
    # tighter shell `timeout` MUST set BENCH_ROW_TIMEOUT_S below it, or the
    # reap order inverts and the TPU child is killed mid-run (lease-wedge
    # risk per CLAUDE.md).
    try:
        p = subprocess.run(argv, cwd=REPO, capture_output=True, text=True,
                           timeout=row_timeout)
    except subprocess.TimeoutExpired as e:
        _write_row_log(f'{name}.bs{batch}.timeout', e.output, e.stderr)
        return {'model': name, 'config': config, 'batch': batch,
                'error': 'timeout', 'detail': f'row exceeded {row_timeout}s'}
    # full row stdout+stderr for post-mortem (the PERF.json detail field
    # keeps only the last 500 chars); batch-qualified so OOM-retry attempts
    # don't overwrite each other
    _write_row_log(f'{name}.bs{batch}.full', p.stdout, p.stderr)
    if (p.returncode != 0 and _tries > 0 and batch >= 64
            and any(m in (p.stderr or '') + (p.stdout or '')
                    for m in OOM_MARKERS)):
        # HBM OOM: the table must carry numbers, not rc=1 rows — retry at
        # half the batch (ms/sample at TPU-serving batches is flat within
        # a few % over a 2x batch range; the row records the batch used).
        # The scales artifact is batch-independent — reuse it.
        print(f'[{name}] OOM at bs{batch}; retrying at bs{batch // 2}',
              flush=True)
        row = run_row(name, config, batch // 2, cond, code_levels,
                      samples_per_loop, n_loop, serving, _tries - 1,
                      _scales=_scales)
        if 'error' not in row:
            row['batch_retried_from'] = batch
            if cal_wall is not None:
                row['cal_wall_s'] = cal_wall
        return row
    if p.returncode != 0:
        return {'model': name, 'config': config, 'batch': batch,
                'error': f'rc={p.returncode}',
                'detail': (p.stderr or p.stdout)[-500:]}
    m = None
    for line in p.stdout.splitlines():
        m = SUMMARY_RE.search(line) or m
    if m is None:
        return {'model': name, 'config': config, 'batch': batch,
                'error': 'no summary line', 'detail': p.stdout[-500:]}
    ms = float(m.group(2))
    row = {'model': name, 'config': config, 'batch': batch, 'cond': cond,
           'code_levels': code_levels, 'serving': serving,
           'ms_per_sample': ms,
           'ar_ms': float(m.group(3)), 'decode_ms': float(m.group(4)),
           'samples_per_sec': round(1000.0 / ms, 1),
           'wall_s': round(time.time() - t0, 1)}
    if _scales:
        row['calibration'] = 'separate-process scales artifact (scales_in)'
    if cal_wall is not None:
        row['cal_wall_s'] = cal_wall
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', type=str, default=','.join(ROWS))
    ap.add_argument('--out', type=str, default=os.path.join(REPO,
                                                            'PERF.json'))
    ap.add_argument('--samples-per-loop', type=int, default=1000)
    ap.add_argument('--n-loop', type=int, default=4)
    ap.add_argument('--batch-override', type=int, default=0,
                    help='override every row batch (CI smoke on CPU)')
    args = ap.parse_args()

    results = []
    for name in args.rows.split(','):
        name = name.strip()
        if name not in ROWS:
            raise SystemExit(f'unknown row {name!r}; known: {list(ROWS)}')
        if os.environ.get('BENCH_LEASE_WAIT') == '1':
            # a row killed by its timeout can wedge the device lease
            # (CLAUDE.md); block UNTIMED on one tiny op in a throwaway
            # subprocess (never killed, so it cannot extend a wedge)
            # before dispatching the next row
            t0 = time.time()
            subprocess.run([sys.executable, '-c',
                            'import jax, jax.numpy as jnp;'
                            'print(float(jnp.sum(jnp.ones((128, 128)))))'],
                           cwd=REPO, capture_output=True)
            print(f'[lease] ready after {time.time() - t0:.0f}s',
                  flush=True)
        spec = ROWS[name]
        config, batch, cond, levels = spec[:4]
        serving = spec[4] if len(spec) > 4 else 'bf16'
        batch = args.batch_override or batch
        print(f'[{name}] {config} bs{batch} {cond} L{levels} {serving}..',
              flush=True)
        row = run_row(name, config, batch, cond, levels,
                      args.samples_per_loop, args.n_loop, serving)
        print(f'[{name}] {json.dumps(row)}', flush=True)
        results.append(row)

    # merge into an existing PERF.json so partial refreshes keep other rows
    merged = {}
    if os.path.exists(args.out):
        try:
            for r in json.load(open(args.out))['rows']:
                merged[r['model']] = r
        except Exception:
            pass
    for r in results:
        merged[r['model']] = r
    out = {'protocol': 'measure_throughput.py (reference protocol: '
                       'batches of batch_size, ~samples_per_loop samples '
                       'per loop, warmup discarded, AR + decode counted)',
           'device': 'tpu v5e (1 chip)',
           'rows': list(merged.values())}
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=1)
        f.write('\n')
    print(f'wrote {args.out} ({len(merged)} rows)')


if __name__ == '__main__':
    main()
