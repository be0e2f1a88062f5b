"""bench.py watchdog: the driver must get ONE JSON line even when the
TPU client wedges or the tunnel is down (both observed on this
deployment). These tests drive bench.main() with a faked subprocess."""

import json
import subprocess

import bench


class _Proc:
    def __init__(self, stdout, returncode=0):
        self.stdout = stdout
        self.returncode = returncode


def test_bench_parses_last_json_line(monkeypatch, capsys):
    good = json.dumps({
        "metric": "e2e_train_tiles_per_sec_per_chip", "value": 18000.0,
        "unit": "tiles/sec/chip", "vs_baseline": 3.6, "detail": {"b": 8},
    })
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: _Proc(f"WARNING: noise\n{{bad json\n{good}\n"),
    )
    assert bench.main() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 18000.0
    assert "detail" not in out  # driver schema: exactly the four keys


def test_bench_retries_wedged_attempt(monkeypatch, capsys):
    calls = {"n": 0}
    good = json.dumps({
        "metric": "e2e_train_tiles_per_sec_per_chip", "value": 17000.0,
        "unit": "tiles/sec/chip", "vs_baseline": 3.4,
    })

    def fake_run(*a, timeout=None, **k):
        calls["n"] += 1
        if calls["n"] == 1:  # first client wedges at init
            raise subprocess.TimeoutExpired(cmd="bench", timeout=timeout)
        return _Proc(good + "\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 0
    assert calls["n"] == 2
    assert json.loads(capsys.readouterr().out.strip())["value"] == 17000.0


def test_bench_emits_honest_zero_line_when_unreachable(monkeypatch, capsys):
    def fake_run(*a, timeout=None, **k):
        raise subprocess.TimeoutExpired(cmd="bench", timeout=timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 1
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0
    assert "UNMEASURED" in out["unit"]


def test_bench_no_result_line_is_a_retryable_failure(monkeypatch, capsys):
    monkeypatch.setattr(
        subprocess, "run", lambda *a, **k: _Proc("crash traceback", 1)
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 1
    assert json.loads(capsys.readouterr().out.strip())["value"] == 0.0
