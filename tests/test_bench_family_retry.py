"""bench_family's OOM-retry: a row that RESOURCE_EXHAUSTEDs must land at a
halved batch with real numbers (the committed PERF.json carries no rc=1
rows), and non-OOM failures must NOT retry.

Pure-stdlib test (bench_family shells out to measure_throughput.py; the
subprocess boundary is stubbed)."""

import importlib.util
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def _load():
    spec = importlib.util.spec_from_file_location(
        'bench_family_under_test',
        os.path.join(HERE, '..', 'scripts', 'bench_family.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _P:
    def __init__(self, rc, out, err=''):
        self.returncode, self.stdout, self.stderr = rc, out, err


def test_oom_retries_at_half_batch(monkeypatch):
    bf = _load()
    monkeypatch.setenv('BENCH_INT8_TWO_PROC', '0')  # retry logic only
    calls = []

    def fake_run(argv, **kw):
        bs = int([a for a in argv
                  if a.startswith('batch_size=')][0].split('=')[1])
        calls.append(bs)
        if bs > 1000:
            return _P(1, '', 'RESOURCE_EXHAUSTED: TPU backend error')
        return _P(0, f'bs{bs} | 2.5000 ms/sample '
                     '(ar: 1.2000, decode: 1.3000)')

    monkeypatch.setattr(bf.subprocess, 'run', fake_run)
    row = bf.run_row('r', 'cfg.yaml', 1536, 'cls', 2, 1000, 4, 'int8max')
    assert calls == [1536, 768]
    assert row['batch'] == 768 and row['batch_retried_from'] == 1536
    assert row['ms_per_sample'] == 2.5 and 'error' not in row


def test_int8_two_process_calibration(monkeypatch, tmp_path):
    """int8 rows calibrate in a separate scales_out process, then measure
    with scales_in; an OOM retry reuses the artifact without recalibrating
    (the fused one-process form RESOURCE_EXHAUSTED the chip at every
    batch; measure_throughput.py scales_in docstring)."""
    bf = _load()
    monkeypatch.setenv('TMPDIR', str(tmp_path))
    import tempfile
    monkeypatch.setattr(bf.tempfile, 'gettempdir', lambda: str(tmp_path))
    calls = []

    def fake_run(argv, **kw):
        args = {a.split('=')[0]: a.split('=', 1)[1]
                for a in argv if '=' in a}
        bs = int(args['batch_size'])
        if 'scales_out' in args:
            calls.append(('cal', bs))
            with open(args['scales_out'], 'wb') as f:
                f.write(b'stub')
            return _P(0, f'wrote serving scales: {args["scales_out"]}')
        assert 'scales_in' in args and os.path.exists(args['scales_in'])
        calls.append(('measure', bs))
        if bs > 1000:
            return _P(1, '', 'RESOURCE_EXHAUSTED: TPU backend error')
        return _P(0, f'bs{bs} | 2.5000 ms/sample '
                     '(ar: 1.2000, decode: 1.3000)')

    monkeypatch.setattr(bf.subprocess, 'run', fake_run)
    row = bf.run_row('r', 'cfg.yaml', 1536, 'cls', 2, 1000, 4, 'int8max')
    # ONE calibration (at the capped cal batch), then measurement attempts
    assert calls == [('cal', 256), ('measure', 1536), ('measure', 768)]
    assert row['batch'] == 768 and 'error' not in row
    assert row['calibration'].startswith('separate-process')
    assert 'cal_wall_s' in row


def test_int8_calibration_failure_is_reported(monkeypatch, tmp_path):
    bf = _load()
    monkeypatch.setattr(bf.tempfile, 'gettempdir', lambda: str(tmp_path))

    def fake_run(argv, **kw):
        return _P(1, '', 'Boom: calibration failed')

    monkeypatch.setattr(bf.subprocess, 'run', fake_run)
    row = bf.run_row('r', 'cfg.yaml', 512, 'cls', 2, 1000, 4, 'int8')
    assert row['error'] == 'calibration rc=1'
    assert 'Boom' in row['detail']


def test_oom_gives_up_after_two_retries(monkeypatch):
    bf = _load()
    calls = []

    def fake_run(argv, **kw):
        calls.append(1)
        return _P(1, '', 'Ran out of memory in memory space hbm')

    monkeypatch.setattr(bf.subprocess, 'run', fake_run)
    row = bf.run_row('r', 'cfg.yaml', 1024, 'cls', 2, 1000, 4)
    assert len(calls) == 3  # 1024, 512, 256
    assert row['error'] == 'rc=1' and row['batch'] == 256


def test_non_oom_failure_does_not_retry(monkeypatch):
    bf = _load()
    calls = []

    def fake_run(argv, **kw):
        calls.append(1)
        return _P(1, '', 'SomeOtherError: not memory related')

    monkeypatch.setattr(bf.subprocess, 'run', fake_run)
    row = bf.run_row('r', 'cfg.yaml', 1024, 'cls', 2, 1000, 4)
    assert calls == [1] and row['error'] == 'rc=1'
