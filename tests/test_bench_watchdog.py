"""bench.py watchdog: the driver must get ONE JSON line even when the
TPU client wedges or the tunnel is down (both observed on this
deployment). These tests drive bench.main() with a faked subprocess.

The watchdog kills the WHOLE process group on timeout: the bench CLI
retries OOM cells in grandchild subprocesses, and a surviving grandchild
would keep holding the exclusive TPU client across attempts.
"""

import json
import subprocess

import bench


class _Proc:
    """Fake Popen handle: communicate() returns stdout or times out."""

    def __init__(self, stdout, returncode=0, wedged=False):
        self.stdout_text = stdout
        self.returncode = returncode
        self.wedged = wedged
        self.pid = 12345
        self.killed = False
        self.waited = False

    def communicate(self, timeout=None):
        if self.wedged:
            raise subprocess.TimeoutExpired(cmd="bench", timeout=timeout)
        return self.stdout_text, None

    def kill(self):
        self.killed = True

    def wait(self):
        self.waited = True


def test_bench_parses_last_json_line(monkeypatch, capsys):
    good = json.dumps({
        "metric": "e2e_train_tiles_per_sec_per_chip", "value": 18000.0,
        "unit": "tiles/sec/chip", "vs_baseline": 3.6, "detail": {"b": 8},
    })
    monkeypatch.setattr(
        subprocess, "Popen",
        lambda *a, **k: _Proc(f"WARNING: noise\n{{bad json\n{good}\n"),
    )
    assert bench.main() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 18000.0
    assert "detail" not in out  # driver schema: exactly the four keys


def test_bench_retries_wedged_attempt_and_kills_process_group(
    monkeypatch, capsys
):
    procs = []
    good = json.dumps({
        "metric": "e2e_train_tiles_per_sec_per_chip", "value": 17000.0,
        "unit": "tiles/sec/chip", "vs_baseline": 3.4,
    })

    def fake_popen(*a, **k):
        assert k.get("start_new_session") is True
        proc = _Proc(good + "\n", wedged=(len(procs) == 0))
        procs.append(proc)
        return proc

    killed_groups = []
    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    monkeypatch.setattr(
        bench.os, "killpg", lambda pgid, sig: killed_groups.append(pgid)
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 0
    assert len(procs) == 2
    # The wedged first attempt had its whole group killed and was reaped.
    assert killed_groups == [procs[0].pid]
    assert procs[0].waited
    assert json.loads(capsys.readouterr().out.strip())["value"] == 17000.0


def test_bench_killpg_falls_back_to_kill(monkeypatch, capsys):
    """If the group is already gone, the direct child still gets killed."""
    proc = _Proc("", wedged=True)
    monkeypatch.setattr(subprocess, "Popen", lambda *a, **k: proc)

    def raise_lookup(pgid, sig):
        raise ProcessLookupError

    monkeypatch.setattr(bench.os, "killpg", raise_lookup)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 1
    assert proc.killed and proc.waited
    assert json.loads(capsys.readouterr().out.strip())["value"] == 0.0


def test_bench_emits_honest_zero_line_when_unreachable(monkeypatch, capsys):
    monkeypatch.setattr(
        subprocess, "Popen", lambda *a, **k: _Proc("", wedged=True)
    )
    monkeypatch.setattr(bench.os, "killpg", lambda pgid, sig: None)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 1
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0
    assert "UNMEASURED" in out["unit"]


def test_bench_no_result_line_is_a_retryable_failure(monkeypatch, capsys):
    monkeypatch.setattr(
        subprocess, "Popen", lambda *a, **k: _Proc("crash traceback", 1)
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.main() == 1
    assert json.loads(capsys.readouterr().out.strip())["value"] == 0.0
