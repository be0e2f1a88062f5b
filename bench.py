#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Flagship: END-TO-END fusion-model (U-Net + Graph WaveNet + Date2Vec)
training throughput — HBM-resident window gather + normalize + full
train step — in 128×128 tiles/sec/chip on the local accelerator.
vs_baseline is relative to the BASELINE.json north star (5,000 tiles/sec/chip).

The measurement runs in a SUBPROCESS with a hard timeout and retries:
on this deployment a fresh TPU client occasionally wedges at backend
init (zero CPU, epoll wait) and the tunnel itself can be down — without
the watchdog, bench.py would hang forever and the driver would record
nothing. A wedged attempt is killed by process handle, the tunnel gets
a settle pause, and the next attempt starts a clean client. If every
attempt fails, an honest zero line is printed (value 0.0, reason in
"unit") rather than no line at all.
"""

import json
import os
import signal
import subprocess
import sys
import time

ATTEMPT_TIMEOUTS = (2100, 1500, 1200)  # first covers fresh remote compiles
SETTLE_SECONDS = 90


def _attempt(timeout_s: int) -> dict:
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
    # New session so a timeout can kill the WHOLE process group: the bench
    # CLI may itself retry OOM cells in grandchild subprocesses
    # (benchmarks._e2e_cell_subprocess), and a surviving grandchild would
    # keep holding the exclusive TPU client, wedging every later attempt.
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "multimodal_outage_tpu", "bench",
            "--config", "e2e_train", "--steps", "20",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
        start_new_session=True,
    )
    try:
        stdout, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        proc.wait()
        raise
    for line in reversed(stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                result = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in result:
                return result
    raise RuntimeError(
        f"bench subprocess exited {proc.returncode} without a result "
        f"line:\n{stdout[-2000:]}"
    )


def main() -> int:
    last_err = None
    for i, timeout_s in enumerate(ATTEMPT_TIMEOUTS):
        if i:
            time.sleep(SETTLE_SECONDS)  # let the TPU tunnel settle
        try:
            result = _attempt(timeout_s)
        except subprocess.TimeoutExpired:
            last_err = f"attempt {i + 1} wedged (>{timeout_s}s), retried"
            print(f"[bench] {last_err}", file=sys.stderr)
            continue
        except Exception as e:  # noqa: BLE001 - retry any attempt failure
            last_err = str(e)
            print(f"[bench] attempt {i + 1} failed: {last_err[:500]}",
                  file=sys.stderr)
            continue
        print(json.dumps({
            "metric": result["metric"],
            "value": result["value"],
            "unit": result["unit"],
            "vs_baseline": result["vs_baseline"],
        }))
        return 0
    print(json.dumps({
        "metric": "e2e_train_tiles_per_sec_per_chip",
        "value": 0.0,
        "unit": f"UNMEASURED - accelerator unreachable: {last_err}"[:200],
        "vs_baseline": 0.0,
    }))
    return 1


if __name__ == "__main__":
    sys.exit(main())
