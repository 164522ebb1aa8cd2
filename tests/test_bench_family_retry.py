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
